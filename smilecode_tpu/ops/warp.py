"""3D spatial warping (the registration `SpatialTransformer`).

Semantics match the reference's torch implementation exactly
(`/root/reference/ModeT/models.py:25-67`): sample ``src`` at ``grid + flow``
(voxel coordinates), trilinear ("bilinear") or nearest interpolation,
zero padding outside the volume, with ``align_corners=True`` semantics.

Note the reference normalizes to [-1, 1] and calls ``F.grid_sample`` with
``align_corners=True``; that round trip is the identity on voxel coordinates
when src and flow share a shape, so we sample directly at ``grid + flow``.
When they differ (the reference exploits this: PR++ composes a 1/8-res flow
through a 1/4-res field, `Baseline methods/PR++/models.py:337`), grid_sample's
normalized coordinates imply ``src_coord = (grid + flow) *
(src_size-1)/(flow_size-1)`` and the output takes the flow's spatial shape.

Layout: channels-last. ``src``: (B, D, H, W, C); ``flow``: (B, D', H', W', 3)
with last axis = (dd, dh, dw) voxel displacements.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def base_grid(d: int, h: int, w: int, dtype=jnp.float32) -> jax.Array:
    """Identity sampling grid of shape (D, H, W, 3); grid[d,h,w] = (d,h,w)."""
    gd = jax.lax.broadcasted_iota(dtype, (d, h, w), 0)
    gh = jax.lax.broadcasted_iota(dtype, (d, h, w), 1)
    gw = jax.lax.broadcasted_iota(dtype, (d, h, w), 2)
    return jnp.stack([gd, gh, gw], axis=-1)


def _gather_volume(src_flat: jax.Array, lin_idx: jax.Array) -> jax.Array:
    """Gather (B, N, C) rows from (B, DHW, C) by (B, N) linear indices."""
    b, n = lin_idx.shape
    c = src_flat.shape[-1]
    out = jnp.take_along_axis(src_flat, lin_idx[..., None], axis=1)
    return out.reshape(b, n, c)


def warp(src: jax.Array, flow: jax.Array, mode: str = "bilinear") -> jax.Array:
    """Warp ``src`` by dense displacement ``flow`` (voxel units, channels-last).

    Args:
      src: (B, D, H, W, C) volume.
      flow: (B, D', H', W', 3) displacement; flow[..., i] moves along spatial
        axis i. Usually D'H'W' == DHW; if not, grid_sample normalized-coord
        rescaling applies (see module docstring).
      mode: "bilinear" (trilinear) or "nearest".

    Returns:
      (B, D', H', W', C), zeros where the sample location falls outside.
    """
    if src.ndim != 5 or flow.ndim != 5 or flow.shape[-1] != 3:
        raise ValueError(f"warp expects NDHWC src and (...,3) flow, got {src.shape}, {flow.shape}")
    b, sd, sh, sw, c = src.shape
    fd, fh, fw = flow.shape[1:4]
    n = fd * fh * fw
    compute_dtype = jnp.promote_types(flow.dtype, jnp.float32)
    coords = base_grid(fd, fh, fw, compute_dtype) + flow.astype(compute_dtype)
    if (fd, fh, fw) != (sd, sh, sw):
        scale = jnp.array(
            [
                (sd - 1) / max(fd - 1, 1),
                (sh - 1) / max(fh - 1, 1),
                (sw - 1) / max(fw - 1, 1),
            ],
            compute_dtype,
        )
        coords = coords * scale
    coords = coords.reshape(b, n, 3)
    src_flat = src.reshape(b, sd * sh * sw, c)
    sizes = jnp.array([sd, sh, sw], dtype=compute_dtype)

    def lin(idx_d, idx_h, idx_w):
        return (idx_d * sh + idx_h) * sw + idx_w

    if mode == "nearest":
        # torch grid_sample 'nearest' rounds half-to-even (std::nearbyint).
        idx = jnp.rint(coords)
        inb = jnp.all((idx >= 0) & (idx <= sizes - 1), axis=-1)
        idx = jnp.clip(idx, 0, sizes - 1).astype(jnp.int32)
        vals = _gather_volume(src_flat, lin(idx[..., 0], idx[..., 1], idx[..., 2]))
        out = jnp.where(inb[..., None], vals, jnp.zeros((), src.dtype))
        return out.reshape(b, fd, fh, fw, c)

    if mode != "bilinear":
        raise ValueError(f"unsupported mode {mode!r}")

    c0 = jnp.floor(coords)
    t = coords - c0  # fractional part in [0, 1)
    out = jnp.zeros((b, n, c), compute_dtype)
    for od in (0, 1):
        for oh in (0, 1):
            for ow in (0, 1):
                idx = c0 + jnp.array([od, oh, ow], compute_dtype)
                # zero-padding: out-of-bounds corners contribute 0
                inb = jnp.all((idx >= 0) & (idx <= sizes - 1), axis=-1)
                idxi = jnp.clip(idx, 0, sizes - 1).astype(jnp.int32)
                wgt = (
                    (t[..., 0] if od else 1.0 - t[..., 0])
                    * (t[..., 1] if oh else 1.0 - t[..., 1])
                    * (t[..., 2] if ow else 1.0 - t[..., 2])
                )
                vals = _gather_volume(src_flat, lin(idxi[..., 0], idxi[..., 1], idxi[..., 2]))
                out = out + jnp.where(inb, wgt, 0.0)[..., None] * vals.astype(compute_dtype)
    return out.reshape(b, fd, fh, fw, c).astype(src.dtype)
