"""Core registration losses: local NCC and diffusion regularizer.

Parity: `NCC_vxm` (`/root/reference/ModeT/losses.py:34-94`) and `Grad3d`
(`/root/reference/ModeT/losses.py:6-31`). Layout: channels-last (B,D,H,W,C).

The reference computes the five 9^3 box-filter sums with dense conv3d; here
we use `lax.reduce_window` adds (zero padding = torch conv padding=4), which
XLA lowers to fast separable accumulations on TPU.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def _box_sum_axis(x: jax.Array, win: int, axis: int) -> jax.Array:
    """Separable box sum along one axis (zero padding), as `win` shifted-slice
    adds — O(win) adds, fully differentiable (reduce_window's autodiff is
    broken under jit in jax 0.9)."""
    pad = win // 2
    pads = [(0, 0)] * x.ndim
    pads[axis] = (pad, pad)
    xp = jnp.pad(x, pads)
    size = x.shape[axis]
    out = None
    for o in range(win):
        sl = jax.lax.slice_in_dim(xp, o, o + size, axis=axis)
        out = sl if out is None else out + sl
    return out


def _box_sum(x: jax.Array, win: int) -> jax.Array:
    for axis in (1, 2, 3):
        x = _box_sum_axis(x, win, axis)
    return x


def ncc_vxm(y_true: jax.Array, y_pred: jax.Array, win: int = 9) -> jax.Array:
    """Local (windowed) normalized cross-correlation loss; returns -mean(cc).

    Matches the reference formula exactly, including the win_size
    mean-reconstruction algebra and the 1e-5 denominator epsilon.
    """
    ii, ji = y_true, y_pred
    i2, j2, ij = ii * ii, ji * ji, ii * ji
    i_sum = _box_sum(ii, win)
    j_sum = _box_sum(ji, win)
    i2_sum = _box_sum(i2, win)
    j2_sum = _box_sum(j2, win)
    ij_sum = _box_sum(ij, win)
    win_size = float(win ** 3)
    u_i = i_sum / win_size
    u_j = j_sum / win_size
    cross = ij_sum - u_j * i_sum - u_i * j_sum + u_i * u_j * win_size
    i_var = i2_sum - 2 * u_i * i_sum + u_i * u_i * win_size
    j_var = j2_sum - 2 * u_j * j_sum + u_j * u_j * win_size
    cc = cross * cross / (i_var * j_var + 1e-5)
    return -jnp.mean(cc)


def grad3d(flow: jax.Array, penalty: str = "l1", loss_mult: float | None = None) -> jax.Array:
    """Diffusion regularizer: mean |forward difference| (or squared) per axis.

    ``flow`` is (B, D, H, W, C); matches Grad3d(y_pred) with channels-last.
    """
    dd = jnp.abs(flow[:, 1:, :, :, :] - flow[:, :-1, :, :, :])
    dh = jnp.abs(flow[:, :, 1:, :, :] - flow[:, :, :-1, :, :])
    dw = jnp.abs(flow[:, :, :, 1:, :] - flow[:, :, :, :-1, :])
    if penalty == "l2":
        dd, dh, dw = dd * dd, dh * dh, dw * dw
    elif penalty != "l1":
        raise ValueError(f"penalty must be l1 or l2, got {penalty!r}")
    g = (jnp.mean(dd) + jnp.mean(dh) + jnp.mean(dw)) / 3.0
    if loss_mult is not None:
        g = g * loss_mult
    return g
