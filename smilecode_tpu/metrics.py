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
    """
    pred = y_pred.reshape(-1)
    true = y_true.reshape(-1)
    lbl = jnp.asarray(labels, dtype=pred.dtype)  # (L,)
    pred_onehot = pred[None, :] == lbl[:, None]  # (L, N)
    true_onehot = true[None, :] == lbl[:, None]
    inter = jnp.sum(pred_onehot & true_onehot, axis=1).astype(jnp.float32)
    union = jnp.sum(pred_onehot, axis=1) + jnp.sum(true_onehot, axis=1)
    dsc = 2.0 * inter / (union.astype(jnp.float32) + 1e-5)
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
