"""Resizing ops with torch ``align_corners=True`` semantics.

Covers the reference's `ResizeTransform` (`/root/reference/ModeT/models.py:90-116`),
`nn.Upsample(scale_factor=2, mode='trilinear', align_corners=True)`
(`/root/reference/ModeT/models.py:354`), and `nn.AvgPool3d(2)`
(`/root/reference/ModeT/models.py:198`).

All separable 1D linear interpolations use constant index gathers, which XLA
lowers to cheap slices/gathers on TPU. Layout: channels-last (B, D, H, W, C).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np


def _interp_axis(x: jax.Array, out_size: int, axis: int) -> jax.Array:
    """1D linear interpolation along ``axis`` with align_corners=True."""
    in_size = x.shape[axis]
    if in_size == out_size:
        return x
    if out_size == 1:
        pos = np.zeros((1,), np.float64)
    elif in_size == 1:
        pos = np.zeros((out_size,), np.float64)
    else:
        pos = np.arange(out_size, dtype=np.float64) * (in_size - 1) / (out_size - 1)
    i0 = np.clip(np.floor(pos).astype(np.int32), 0, in_size - 1)
    i1 = np.clip(i0 + 1, 0, in_size - 1)
    frac = (pos - i0).astype(np.float32)
    shape = [1] * x.ndim
    shape[axis] = out_size
    fr = jnp.asarray(frac, dtype=x.dtype).reshape(shape)
    x0 = jnp.take(x, jnp.asarray(i0), axis=axis)
    x1 = jnp.take(x, jnp.asarray(i1), axis=axis)
    return x0 * (1 - fr) + x1 * fr


def interp_trilinear(x: jax.Array, out_shape: tuple[int, int, int]) -> jax.Array:
    """Trilinear resize (align_corners=True) of (B, D, H, W, C) to out_shape."""
    for axis, size in zip((1, 2, 3), out_shape):
        x = _interp_axis(x, size, axis)
    return x


def upsample2_trilinear(x: jax.Array) -> jax.Array:
    """2x trilinear upsampling, align_corners=True (torch Upsample parity)."""
    _, d, h, w, _ = x.shape
    return interp_trilinear(x, (2 * d, 2 * h, 2 * w))


def resize_flow(x: jax.Array, factor: float) -> jax.Array:
    """ResizeTransform parity: resize a flow field and rescale its magnitude.

    `factor` is the reference's ``self.factor = 1 / vel_resize``
    (`/root/reference/ModeT/models.py:97`). Output spatial size =
    floor(in * factor) per torch ``interpolate(scale_factor=...)``.
    """
    if factor == 1:
        return x
    _, d, h, w, _ = x.shape
    out_shape = (int(d * factor), int(h * factor), int(w * factor))
    if factor < 1:
        x = interp_trilinear(x, out_shape)
        return x * factor
    x = x * factor
    return interp_trilinear(x, out_shape)


def avg_pool2(x: jax.Array) -> jax.Array:
    """AvgPool3d(kernel=2, stride=2) over (B, D, H, W, C).

    Implemented as reshape + mean (exact for k=s=2, and differentiable —
    reduce_window's autodiff is broken under jit in jax 0.9)."""
    b, d, h, w, c = x.shape
    x = x.reshape(b, d // 2, 2, h // 2, 2, w // 2, 2, c)
    return x.mean(axis=(2, 4, 6))


def upsample2_nearest(x: jax.Array) -> jax.Array:
    """2x nearest upsampling (torch Upsample mode='nearest' parity)."""
    b, d, h, w, c = x.shape
    x = jnp.broadcast_to(x[:, :, None, :, None, :, None, :], (b, d, 2, h, 2, w, 2, c))
    return x.reshape(b, 2 * d, 2 * h, 2 * w, c)
