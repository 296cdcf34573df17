"""Evaluation metrics: LPBA VOI Dice, Jacobian determinant, folding fraction.

Parity: `dice_val_VOI` (`/root/reference/ModeT/utils.py:86-106`),
`jacobian_determinant_vxm` (`/root/reference/ModeT/utils.py:108-150` — which
uses np.gradient: central differences interior, one-sided at borders), and the
fold statistic %voxels(|J| <= 0) (`/root/reference/ModeT/infer.py:89-90`).

Both device (jnp, vectorized over labels — no python per-label loop) and
numpy implementations are provided; they agree to float tolerance.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np

# The 54 LPBA VOI labels after Seg_norm remapping (labels 1..54).
VOI_LBLS = tuple(range(1, 55))


@functools.partial(jax.jit, static_argnames=("labels",))
def dice_val_voi(y_pred: jax.Array, y_true: jax.Array, labels: tuple = VOI_LBLS) -> jax.Array:
    """Mean Dice over the given labels. y_pred/y_true: integer volumes.

    Accepts any shape (the reference uses [0, 0] of (B,1,D,H,W); here pass
    the raw (D,H,W) or (B,D,H,W,1) volumes — all voxels are flattened).

    Implementation: lax.scan over fixed voxel chunks accumulating per-label
    (intersection, |pred|, |true|) counts. The earlier whole-volume one-hot
    formulation materialized two (54, N) bool tensors (~0.5 GB of
    intermediates at 4.9 M voxels) inside the jitted eval step; the chunked
    scan keeps the live intermediates at (54, 2^17) (~7 MB) with identical
    results — compares are plain VPU vector ops, no gather/scatter.
    """
    pred = y_pred.reshape(-1).astype(jnp.int32)
    true = y_true.reshape(-1).astype(jnp.int32)
    lbl = jnp.asarray(labels, dtype=jnp.int32)  # (L,)
    chunk = min(1 << 17, pred.shape[0])
    pad = (-pred.shape[0]) % chunk
    # distinct out-of-vocab pad values: padding never matches a label and
    # never intersects
    pred = jnp.pad(pred, (0, pad), constant_values=-1).reshape(-1, chunk)
    true = jnp.pad(true, (0, pad), constant_values=-2).reshape(-1, chunk)

    def body(acc, pt):
        p, t = pt
        po = p[None, :] == lbl[:, None]  # (L, chunk)
        to = t[None, :] == lbl[:, None]
        return (
            acc[0] + jnp.sum(po & to, axis=1),
            acc[1] + jnp.sum(po, axis=1),
            acc[2] + jnp.sum(to, axis=1),
        ), ()

    zeros = jnp.zeros((lbl.shape[0],), jnp.int32)
    (inter, n_pred, n_true), _ = jax.lax.scan(body, (zeros, zeros, zeros), (pred, true))
    dsc = 2.0 * inter.astype(jnp.float32) / ((n_pred + n_true).astype(jnp.float32) + 1e-5)
    return jnp.mean(dsc)


def dice_val_voi_np(y_pred: np.ndarray, y_true: np.ndarray, labels=VOI_LBLS) -> float:
    """Numpy mirror of the reference loop (for eval-protocol parity checks)."""
    pred = np.asarray(y_pred).reshape(-1)
    true = np.asarray(y_true).reshape(-1)
    dscs = []
    for i in labels:
        pred_i = pred == i
        true_i = true == i
        inter = np.sum(pred_i * true_i)
        union = np.sum(pred_i) + np.sum(true_i)
        dscs.append(2.0 * inter / (union + 1e-5))
    return float(np.mean(dscs))


def _np_gradient_axis(x: jnp.ndarray, axis: int) -> jnp.ndarray:
    """np.gradient semantics: central diff interior, one-sided at the edges."""
    upper = jnp.take(x, jnp.arange(2, x.shape[axis]), axis=axis)
    lower = jnp.take(x, jnp.arange(0, x.shape[axis] - 2), axis=axis)
    interior = (upper - lower) * 0.5
    first = jnp.take(x, jnp.asarray([1]), axis=axis) - jnp.take(x, jnp.asarray([0]), axis=axis)
    last = jnp.take(x, jnp.asarray([x.shape[axis] - 1]), axis=axis) - jnp.take(
        x, jnp.asarray([x.shape[axis] - 2]), axis=axis
    )
    return jnp.concatenate([first, interior, last], axis=axis)


@jax.jit
def jacobian_determinant(disp: jax.Array) -> jax.Array:
    """Voxelwise Jacobian determinant of a displacement field (D, H, W, 3).

    Matches `jacobian_determinant_vxm` (reference passes (3, D, H, W) and
    transposes; pass channels-last directly here).
    """
    d, h, w, _ = disp.shape
    from smilecode_tpu.ops.warp import base_grid

    phi = disp + base_grid(d, h, w, disp.dtype)
    jd = _np_gradient_axis(phi, 0)
    jh = _np_gradient_axis(phi, 1)
    jw = _np_gradient_axis(phi, 2)
    det0 = jd[..., 0] * (jh[..., 1] * jw[..., 2] - jh[..., 2] * jw[..., 1])
    det1 = jd[..., 1] * (jh[..., 0] * jw[..., 2] - jh[..., 2] * jw[..., 0])
    det2 = jd[..., 2] * (jh[..., 0] * jw[..., 1] - jh[..., 1] * jw[..., 0])
    return det0 - det1 + det2


@jax.jit
def fold_fraction(disp: jax.Array) -> jax.Array:
    """Fraction of voxels with Jacobian determinant <= 0 (folding metric)."""
    det = jacobian_determinant(disp)
    return jnp.mean(det <= 0)
