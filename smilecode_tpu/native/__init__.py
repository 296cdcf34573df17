"""Native (C++/OpenMP) host data-path kernels with numpy fallbacks.

Builds `libpreproc.so` from `preproc.cpp` on first use (g++, cached next to
the source); every entry point transparently falls back to numpy when the
toolchain or the shared object is unavailable, so the framework never hard
-depends on the native build.
"""

from __future__ import annotations

import ctypes
import os
import subprocess

import numpy as np

_HERE = os.path.dirname(__file__)
_SRC = os.path.join(_HERE, "preproc.cpp")
_SO = os.path.join(_HERE, "libpreproc.so")
_LIB = None
_TRIED = False


def _build() -> bool:
    cmd = [
        "g++", "-O3", "-march=native", "-fopenmp", "-shared", "-fPIC",
        _SRC, "-o", _SO,
    ]
    try:
        subprocess.run(cmd, check=True, capture_output=True, timeout=120)
        return True
    except Exception:
        try:  # retry without -march/-fopenmp (portability fallback)
            subprocess.run(
                ["g++", "-O3", "-shared", "-fPIC", _SRC, "-o", _SO],
                check=True, capture_output=True, timeout=120,
            )
            return True
        except Exception:
            return False


def _lib():
    global _LIB, _TRIED
    if _LIB is not None or _TRIED:
        return _LIB
    _TRIED = True
    if not os.path.exists(_SO) or os.path.getmtime(_SO) < os.path.getmtime(_SRC):
        if not _build():
            return None
    try:
        lib = ctypes.CDLL(_SO)
    except OSError:
        return None
    i64, u16p, f32p = ctypes.c_int64, np.ctypeslib.ndpointer(np.uint16), np.ctypeslib.ndpointer(np.float32)
    i64p = np.ctypeslib.ndpointer(np.int64)
    lib.seg_remap_u16.argtypes = [u16p, i64, u16p, i64, u16p]
    lib.minmax_normalize_f32.argtypes = [f32p, i64, f32p]
    lib.halfres_f32.argtypes = [f32p, i64, i64, i64, f32p]
    lib.halfres_u16.argtypes = [u16p, i64, i64, i64, u16p]
    lib.dice_counts_u16.argtypes = [u16p, u16p, i64, i64, i64p, i64p, i64p]
    _LIB = lib
    return lib


def available() -> bool:
    return _lib() is not None


def seg_remap(seg: np.ndarray, table: np.ndarray) -> np.ndarray:
    """Single-pass LUT label remap (Seg_norm equivalent)."""
    lib = _lib()
    if lib is None or seg.dtype not in (np.uint16, np.dtype("uint16")):
        out = np.zeros_like(seg)
        for i, lbl in enumerate(table):
            out[seg == lbl] = i
        return out
    seg_c = np.ascontiguousarray(seg, np.uint16)
    table_c = np.ascontiguousarray(table, np.uint16)
    out = np.empty_like(seg_c)
    lib.seg_remap_u16(seg_c.reshape(-1), seg_c.size, table_c, table_c.size, out.reshape(-1))
    return out.reshape(seg.shape)


def minmax_normalize(img: np.ndarray) -> np.ndarray:
    lib = _lib()
    if lib is None or img.dtype != np.float32:
        return ((img - img.min()) / (img.max() - img.min())).astype(np.float32)
    img_c = np.ascontiguousarray(img)
    out = np.empty_like(img_c)
    lib.minmax_normalize_f32(img_c.reshape(-1), img_c.size, out.reshape(-1))
    return out.reshape(img.shape)


def halfres(vol: np.ndarray) -> np.ndarray:
    """vol[::2, ::2, ::2] (Half dataset variants), single-pass native copy."""
    lib = _lib()
    if lib is None or vol.ndim != 3 or vol.dtype not in (np.float32, np.uint16):
        return np.ascontiguousarray(vol[::2, ::2, ::2])
    vol_c = np.ascontiguousarray(vol)
    d, h, w = vol.shape
    out = np.empty(((d + 1) // 2, (h + 1) // 2, (w + 1) // 2), vol.dtype)
    fn = lib.halfres_f32 if vol.dtype == np.float32 else lib.halfres_u16
    fn(vol_c, d, h, w, out)
    return out


def dice_counts(pred: np.ndarray, true: np.ndarray, nlabels: int):
    """(intersection, |pred|, |true|) per label id in one pass."""
    lib = _lib()
    if lib is None:
        inter = np.zeros(nlabels, np.int64)
        pc = np.zeros(nlabels, np.int64)
        tc = np.zeros(nlabels, np.int64)
        p = pred.reshape(-1)
        t = true.reshape(-1)
        for lbl in range(nlabels):
            pi, ti = p == lbl, t == lbl
            inter[lbl] = np.sum(pi & ti)
            pc[lbl] = pi.sum()
            tc[lbl] = ti.sum()
        return inter, pc, tc
    p = np.ascontiguousarray(pred.reshape(-1), np.uint16)
    t = np.ascontiguousarray(true.reshape(-1), np.uint16)
    inter = np.zeros(nlabels, np.int64)
    pc = np.zeros(nlabels, np.int64)
    tc = np.zeros(nlabels, np.int64)
    lib.dice_counts_u16(p, t, p.size, nlabels, inter, pc, tc)
    return inter, pc, tc


def dice_val_voi_native(pred: np.ndarray, true: np.ndarray, nlabels: int = 55) -> float:
    """54-VOI mean Dice via the single-pass native counts (labels 1..54)."""
    inter, pc, tc = dice_counts(pred, true, nlabels)
    dsc = 2.0 * inter[1:] / (pc[1:] + tc[1:] + 1e-5)
    return float(np.mean(dsc))
