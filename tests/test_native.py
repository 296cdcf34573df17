"""Native C++ data-path kernels vs numpy reference behavior."""

import numpy as np
import pytest

from smilecode_tpu import native
from smilecode_tpu.data.trans import LPBA_SEG_TABLE, Seg_norm
from smilecode_tpu.metrics import dice_val_voi_np

RNG = np.random.default_rng(13)


def test_native_builds():
    assert native.available(), "native toolchain present in this image; build must succeed"


def test_seg_remap_matches_reference_loop():
    seg = RNG.choice(LPBA_SEG_TABLE, (20, 22, 20)).astype(np.uint16)
    seg[0, 0, 0] = 999  # unknown label -> 0
    ref = np.zeros_like(seg)
    for i, lbl in enumerate(LPBA_SEG_TABLE):
        ref[seg == lbl] = i
    out = native.seg_remap(seg, LPBA_SEG_TABLE)
    np.testing.assert_array_equal(out, ref)
    # and through the transform protocol
    out2 = Seg_norm().tf(seg, k=1)
    np.testing.assert_array_equal(out2, ref)


def test_minmax_matches():
    img = (RNG.random((16, 16, 16)) * 100 - 30).astype(np.float32)
    out = native.minmax_normalize(img)
    ref = (img - img.min()) / (img.max() - img.min())
    np.testing.assert_allclose(out, ref, atol=1e-6)


def test_halfres_matches():
    for dt in (np.float32, np.uint16):
        vol = (RNG.random((17, 16, 15)) * 50).astype(dt)
        np.testing.assert_array_equal(native.halfres(vol), vol[::2, ::2, ::2])


def test_dice_counts_match_metrics():
    pred = RNG.integers(0, 55, (24, 24, 24)).astype(np.uint16)
    true = RNG.integers(0, 55, (24, 24, 24)).astype(np.uint16)
    fast = native.dice_val_voi_native(pred, true)
    ref = dice_val_voi_np(pred, true)
    np.testing.assert_allclose(fast, ref, atol=1e-6)
