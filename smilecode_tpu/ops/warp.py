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


def _sample_coords(src, flow):
    """Absolute sample coordinates (B, N, 3) incl. shape-mismatch rescale."""
    b = src.shape[0]
    sd, sh, sw = src.shape[1:4]
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
    return coords.reshape(b, n, 3), compute_dtype


def _round_up(x: int, m: int) -> int:
    return (x + m - 1) // m * m


def _warp_bilinear_packed(src: jax.Array, flow: jax.Array) -> jax.Array:
    """Trilinear warp via ONE vectorized row-gather.

    XLA-TPU gathers of single elements run ~1 element/8 cycles (scalar loop),
    but 128-lane ROW gathers are vector-speed. So we pack, per source cell,
    all 8 trilinear corner values (x C channels, x a group of adjacent cells)
    into one 128-lane row; the warp is then one row-take plus a fused
    weighted lane-reduction. ~15x faster than the naive 8-corner gather at
    160x192x160 and exactly equal numerically (same corners, same weights).
    """
    b, sd, sh, sw, c = src.shape
    fd, fh, fw = flow.shape[1:4]
    n = fd * fh * fw
    if c > 16:
        # split channels into groups that fit a 128-lane row
        outs = [
            _warp_bilinear_packed(src[..., i : i + 16], flow) for i in range(0, c, 16)
        ]
        return jnp.concatenate(outs, axis=-1)

    coords, cdt = _sample_coords(src, flow)
    c0 = jnp.floor(coords)
    t = coords - c0
    sizes = jnp.array([sd, sh, sw], dtype=cdt)

    # cells per row; row lane layout = corner*(cpr*C) + cell*C + channel
    # (corner-major so every concatenated piece has a large minor dim —
    # a (..., 8, C) minor layout would tile-pad up to 42x in HBM)
    cpr = 1
    while cpr * 2 * 8 * c <= 128:
        cpr *= 2
    lanes = cpr * 8 * c

    # pack: pad 1 voxel before / 2 after so cell indices c0+1 in [0, S+1]
    # always have both corners available (zeros outside = grid_sample zeros)
    swp = _round_up(sw + 2, cpr)
    srcp = jnp.pad(src, ((0, 0), (1, 2), (1, 2), (1, swp - sw), (0, 0)))
    rows_per_batch = (sd + 2) * (sh + 2) * (swp // cpr)
    # build via sequential dynamic_update_slice on the lane axis rather than
    # one 8-way concat: XLA materialized all 8 corner pieces at 16x lane
    # padding for C=8 (8 x 1.2 GB in an on-chip OOM dump); the sequential
    # build keeps at most one piece alive
    pack = jnp.zeros((b, sd + 2, sh + 2, swp // cpr, 128), src.dtype)
    for idx, (od, oh, ow) in enumerate(
        (od, oh, ow) for od in (0, 1) for oh in (0, 1) for ow in (0, 1)
    ):
        piece = srcp[:, od : od + sd + 2, oh : oh + sh + 2, ow : ow + swp, :].reshape(
            b, sd + 2, sh + 2, swp // cpr, cpr * c
        )
        pack = jax.lax.dynamic_update_slice(
            pack, piece, (0, 0, 0, 0, idx * cpr * c)
        )
    pack = pack.reshape(b * rows_per_batch, 128)

    # cell indices (+1 for the pack's leading pad), clipped into pack range
    cell = jnp.clip(c0, -1, sizes).astype(jnp.int32) + 1  # (B, N, 3)
    cd, ch, cw = cell[..., 0], cell[..., 1], cell[..., 2]
    row = (cd * (sh + 2) + ch) * (swp // cpr) + cw // cpr
    row = row + jnp.arange(b, dtype=jnp.int32)[:, None] * rows_per_batch
    rows = jnp.take(pack, row.reshape(-1), axis=0)  # (B*N, 128)

    # corner weights with OOB zero-masking per axis
    def axis_w(tt, cc, size):
        inb0 = (cc >= 0) & (cc <= size - 1)
        inb1 = (cc + 1 >= 0) & (cc + 1 <= size - 1)
        w0 = jnp.where(inb0, 1.0 - tt, 0.0)
        w1 = jnp.where(inb1, tt, 0.0)
        return w0, w1

    wd0, wd1 = axis_w(t[..., 0], c0[..., 0], sd)
    wh0, wh1 = axis_w(t[..., 1], c0[..., 1], sh)
    ww0, ww1 = axis_w(t[..., 2], c0[..., 2], sw)
    wgts = jnp.stack(
        [
            (wd0 if od == 0 else wd1)
            * (wh0 if oh == 0 else wh1)
            * (ww0 if ow == 0 else ww1)
            for od in (0, 1)
            for oh in (0, 1)
            for ow in (0, 1)
        ],
        axis=-1,
    )  # (B, N, 8)

    # select the cell slot within the row and reduce corners
    # (corner-major lane layout: lane = corner*(cpr*C) + cell*C + channel)
    rowsr = rows[:, : cpr * 8 * c].reshape(b * n, 8, cpr, c)
    slot = (cw % cpr).reshape(-1)  # (B*N,)
    slot_mask = (
        jax.lax.broadcasted_iota(jnp.int32, (b * n, cpr), 1) == slot[:, None]
    ).astype(rowsr.dtype)
    weighted = rowsr * slot_mask[:, None, :, None] * wgts.reshape(b * n, 8, 1, 1)
    out = jnp.sum(weighted, axis=(1, 2))  # (B*N, C)
    return out.reshape(b, fd, fh, fw, c).astype(src.dtype)


def warp(src: jax.Array, flow: jax.Array, mode: str = "bilinear", impl: str = "auto") -> jax.Array:
    """Warp ``src`` by dense displacement ``flow`` (voxel units, channels-last).

    Args:
      src: (B, D, H, W, C) volume.
      flow: (B, D', H', W', 3) displacement; flow[..., i] moves along spatial
        axis i. Usually D'H'W' == DHW; if not, grid_sample normalized-coord
        rescaling applies (see module docstring).
      mode: "bilinear" (trilinear) or "nearest".
      impl: "auto" (packed row-gather for bilinear — TPU fast path),
        "packed", "simple" (naive 8-corner gather; the reference oracle),
        "pallas" (windowed-DMA kernel, fastest for SMOOTH flows but clamps
        tiles whose (d,h) spread exceeds its window — see kernels/warp3d.py),
        or "guarded" (windowed kernel with a lax.cond fallback to the
        naive-gather oracle `_warp_simple` whenever any tile would clamp —
        exact for every flow; the packed path is NOT used in the fallback
        branch because cond reserves both branches' allocations and the
        pack temps are multi-GB).

    Returns:
      (B, D', H', W', C), zeros where the sample location falls outside.
    """
    if src.ndim != 5 or flow.ndim != 5 or flow.shape[-1] != 3:
        raise ValueError(f"warp expects NDHWC src and (...,3) flow, got {src.shape}, {flow.shape}")
    if impl == "auto":
        impl = WARP_IMPL
    if mode == "bilinear" and impl in ("pallas", "guarded"):
        import jax as _jax

        from smilecode_tpu.kernels.warp3d import warp3d_guarded, warp3d_pallas

        interp = _jax.default_backend() != "tpu"
        if impl == "guarded":
            return warp3d_guarded(src, flow, interp)
        return warp3d_pallas(src, flow, interp)
    if mode == "bilinear" and impl in ("auto", "packed"):
        return _warp_bilinear_packed(src, flow)
    return _warp_simple(src, flow, mode)


# process-wide default for impl="auto": "packed" is exact for any flow;
# "pallas" is faster for smooth flows but clamps beyond its window budget
WARP_IMPL = "packed"


def _warp_simple(src: jax.Array, flow: jax.Array, mode: str = "bilinear") -> jax.Array:
    """Naive per-corner gather implementation (oracle / nearest mode)."""
    if src.ndim != 5 or flow.ndim != 5 or flow.shape[-1] != 3:
        raise ValueError(f"warp expects NDHWC src and (...,3) flow, got {src.shape}, {flow.shape}")
    b = src.shape[0]
    sd, sh, sw = src.shape[1:4]
    fd, fh, fw = flow.shape[1:4]
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
    return warp_coords(src, coords.reshape(b, fd * fh * fw, 3), (fd, fh, fw), mode)


def warp_coords(src: jax.Array, coords: jax.Array, out_spatial, mode: str = "bilinear") -> jax.Array:
    """Sample ``src`` at ABSOLUTE voxel coordinates (B, N, 3) -> out_spatial.

    grid_sample semantics (align_corners=True, zeros outside). Used directly
    by the spatial-sharding warp, where each shard samples a globally
    gathered source at offset coordinates (`parallel/modet_sp.py`)."""
    b, sd, sh, sw, c = src.shape
    fd, fh, fw = out_spatial
    n = fd * fh * fw
    compute_dtype = jnp.promote_types(coords.dtype, jnp.float32)
    coords = coords.astype(compute_dtype)
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
