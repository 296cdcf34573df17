"""Model-level spatial (halo-exchange) parallelism: D-sharded ModeT forward.

Runs the FULL ModeT forward (`smilecode_tpu/models/modet.py`, reference
`/root/reference/ModeT/models.py:337-412`) with the depth axis sharded over
the ("spatial",) mesh axis — the registration analog of context parallelism
(SURVEY.md §2.5) for volumes whose activations exceed one chip's HBM.

Halo/collective treatment per op:
  * 3^3 convs: per-layer 1-voxel D halo (`parallel.spatial.halo_conv`);
  * InstanceNorm: cross-shard mean/var via psum (torch IN is a full-volume
    per-channel statistic, `ops/blocks.py:39-43`);
  * neighborhood attention: 1-voxel D halo on K, then the XLA oracle with
    `k_prepadded_d=True` (halo zeros at the global boundary == the
    reference's `nnf.pad`);
  * trilinear 2x upsample: 1-voxel D halo + per-shard global-index
    interpolation (align_corners positions cross shard boundaries);
  * warp: all_gather of the source over "spatial" + absolute-coordinate
    sampling (`ops.warp.warp_coords`) — exact for ANY displacement
    magnitude, unlike a bounded-halo scheme;
  * avg-pool, projections, LayerNorm, softmax, flow arithmetic: local.

The dryrun (`__graft_entry__.dryrun_multichip`) asserts this forward equals
the unsharded flax model voxel-for-voxel.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax import shard_map
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from smilecode_tpu.ops.attention import _neighborhood_attention_xla
from smilecode_tpu.ops.blocks import leaky_relu
from smilecode_tpu.ops.resize import _interp_axis
from smilecode_tpu.ops.warp import base_grid, warp_coords
from smilecode_tpu.parallel.spatial import halo_conv, halo_exchange

AXIS = "spatial"


def _instance_norm_sp(x, eps: float = 1e-5):
    """torch InstanceNorm3d with D sharded: psum'd per-(B, C) statistics."""
    local_cnt = x.shape[1] * x.shape[2] * x.shape[3]
    s = jax.lax.psum(jnp.sum(x, axis=(1, 2, 3), keepdims=True), AXIS)
    ss = jax.lax.psum(jnp.sum(x * x, axis=(1, 2, 3), keepdims=True), AXIS)
    cnt = jax.lax.psum(jnp.asarray(local_cnt, x.dtype), AXIS)
    mean = s / cnt
    var = ss / cnt - mean * mean
    return (x - mean) * jax.lax.rsqrt(var + eps)


def _conv_block(p, x, alpha=0.1):
    return leaky_relu(halo_conv(x, p["main"]["kernel"], p["main"]["bias"]), alpha)


def _conv_ins_block(p, x, alpha=0.1):
    y = halo_conv(x, p["main"]["kernel"], p["main"]["bias"])
    return leaky_relu(_instance_norm_sp(y), alpha)


def _avg_pool2(x):
    b, d, h, w, c = x.shape
    return x.reshape(b, d // 2, 2, h // 2, 2, w // 2, 2, c).mean(axis=(2, 4, 6))


def _encoder_sp(p, x):
    out0 = _conv_block(p["conv0_0"], x)
    out0 = _conv_ins_block(p["conv0_1"], out0)
    out0 = _conv_ins_block(p["conv0_2"], out0)
    outs = [out0]
    for lvl in (1, 2, 3, 4):
        y = _avg_pool2(outs[-1])
        y = _conv_ins_block(p[f"conv{lvl}_1"], y)
        y = _conv_ins_block(p[f"conv{lvl}_2"], y)
        outs.append(y)
    return outs


def _proj_sp(p, x):
    y = x @ p["proj"]["kernel"] + p["proj"]["bias"]
    mean = jnp.mean(y, axis=-1, keepdims=True)
    var = jnp.var(y, axis=-1, keepdims=True)
    y = (y - mean) * jax.lax.rsqrt(var + 1e-5)
    return y * p["norm"]["scale"] + p["norm"]["bias"]


def _attention_sp(p, q, k, heads: int, scale: float):
    b, dl, h, w, c = q.shape
    hd = c // heads
    kh = halo_exchange(k, 1, AXIS)
    q6 = q.reshape(b, dl, h, w, heads, hd)
    k6 = kh.reshape(b, dl + 2, h, w, heads, hd)
    return _neighborhood_attention_xla(q6, k6, p["rpb"], scale, k_prepadded_d=True)


def _upsample2_sp(x):
    """2x trilinear upsample (align_corners) with D sharded: the D axis
    interpolates at global positions using a 1-voxel halo; H/W are local."""
    n = jax.lax.axis_size(AXIS)
    i = jax.lax.axis_index(AXIS)
    b, dl, h, w, c = x.shape
    d_glob = dl * n
    xh = halo_exchange(x, 1, AXIS)  # (b, dl+2, h, w, c)
    if d_glob == 1:
        up = jnp.concatenate([x, x], axis=1)
    else:
        dg = i * 2 * dl + jnp.arange(2 * dl)
        pos = dg.astype(x.dtype) * ((d_glob - 1) / (2 * d_glob - 1))
        i0 = jnp.floor(pos)
        t = (pos - i0)[None, :, None, None, None].astype(x.dtype)
        loc0 = i0.astype(jnp.int32) - i * dl + 1  # into the haloed block
        x0 = jnp.take(xh, jnp.clip(loc0, 0, dl + 1), axis=1)
        x1 = jnp.take(xh, jnp.clip(loc0 + 1, 0, dl + 1), axis=1)
        up = x0 * (1 - t) + x1 * t
    up = _interp_axis(up, 2 * h, 2)
    up = _interp_axis(up, 2 * w, 3)
    return up


def _warp_sp(src, flow, mode="bilinear"):
    """All-gather warp: exact for any displacement. src/flow same local res."""
    i = jax.lax.axis_index(AXIS)
    b, dl, h, w, c = src.shape
    src_g = jax.lax.all_gather(src, AXIS, axis=1, tiled=True)
    coords = base_grid(dl, h, w, jnp.float32) + flow.astype(jnp.float32)
    coords = coords.at[..., 0].add(jnp.asarray(i * dl, jnp.float32))
    return warp_coords(src_g, coords.reshape(b, dl * h * w, 3), (dl, h, w), mode)


def _cwm_sp(p, x, channels_in: int):
    num_fields = channels_in // 3
    x = _upsample2_sp(x)
    wgt = _conv_ins_block(p["conv_0"], x)
    wgt = _conv_ins_block(p["conv_1"], wgt)
    wgt = halo_conv(wgt, p["conv_2"]["kernel"], p["conv_2"]["bias"])
    wgt = jax.nn.softmax(wgt, axis=-1)
    b, d, h, ww_, _ = x.shape
    fields = x.reshape(b, d, h, ww_, num_fields, 3)
    return 2.0 * jnp.sum(fields * wgt[..., None], axis=-2)


def _modet_forward_local(p, moving, fixed, num_heads, head_dim, qk_scale):
    """The ModeT graph (`models/modet.py:145-198`) on local D blocks."""
    nh = num_heads
    scale = qk_scale or head_dim ** -0.5
    m = _encoder_sp(p["encoder"], moving)
    f = _encoder_sp(p["encoder"], fixed)
    m1, m2, m3, m4, m5 = m
    f1, f2, f3, f4, f5 = f

    # level 5 (1/16)
    q5 = _proj_sp(p["projblock5"], f5)
    k5 = _proj_sp(p["projblock5"], m5)
    w = _attention_sp(p["mdt5"], q5, k5, nh[0], scale)
    flow = _cwm_sp(p["cwm5"], w, 3 * nh[0])

    # level 4 (1/8)
    m4 = _warp_sp(m4, flow)
    q4 = _proj_sp(p["projblock4"], f4)
    k4 = _proj_sp(p["projblock4"], m4)
    w = _attention_sp(p["mdt4"], q4, k4, nh[1], scale)
    w = _cwm_sp(p["cwm4"], w, 3 * nh[1])
    flow = _warp_sp(_upsample2_sp(2 * flow), w) + w

    # level 3 (1/4)
    m3 = _warp_sp(m3, flow)
    q3 = _proj_sp(p["projblock3"], f3)
    k3 = _proj_sp(p["projblock3"], m3)
    w = _attention_sp(p["mdt3"], q3, k3, nh[2], scale)
    w = _cwm_sp(p["cwm3"], w, 3 * nh[2])
    flow = _warp_sp(_upsample2_sp(2 * flow), w) + w

    # level 2 (1/2): compose THEN upsample (reference quirk)
    m2 = _warp_sp(m2, flow)
    q2 = _proj_sp(p["projblock2"], f2)
    k2 = _proj_sp(p["projblock2"], m2)
    w = _attention_sp(p["mdt2"], q2, k2, nh[3], scale)
    flow = _upsample2_sp(2 * (_warp_sp(flow, w) + w))

    # level 1 (full res)
    m1 = _warp_sp(m1, flow)
    q1 = _proj_sp(p["projblock1"], f1)
    k1 = _proj_sp(p["projblock1"], m1)
    w = _attention_sp(p["mdt1"], q1, k1, nh[4], scale)
    flow = _warp_sp(flow, w) + w

    y_moved = _warp_sp(moving, flow)
    return y_moved, flow


def modet_forward_spatial(
    mesh: Mesh,
    params,
    moving,
    fixed,
    num_heads=(8, 4, 2, 1, 1),
    head_dim: int = 6,
    qk_scale: float | None = 1.0,
):
    """ModeT forward with D sharded over mesh axis "spatial".

    params: the flax params dict from `ModeT(...).init`. moving/fixed:
    (B, D, H, W, 1) with D divisible by 16 * n_spatial_shards.
    Returns (y_moved, flow) as global (sharded) arrays.
    """
    n_sp = mesh.shape[AXIS]
    d = moving.shape[1]
    if d % (16 * n_sp) != 0:
        raise ValueError(f"D={d} must be divisible by 16*{n_sp}")
    p = params["params"] if "params" in params else params

    spec = P(None, AXIS)
    fwd = functools.partial(
        _modet_forward_local,
        num_heads=tuple(num_heads),
        head_dim=head_dim,
        qk_scale=qk_scale,
    )

    run = shard_map(
        lambda pp, mv, fx: fwd(pp, mv, fx),
        mesh=mesh,
        in_specs=(P(), spec, spec),
        out_specs=(spec, spec),
        check_vma=False,
    )
    # (re)place everything on THIS mesh — callers may hold params/inputs on
    # a different (e.g. wider data-parallel) mesh
    p = jax.device_put(p, NamedSharding(mesh, P()))
    moving = jax.device_put(moving, NamedSharding(mesh, spec))
    fixed = jax.device_put(fixed, NamedSharding(mesh, spec))
    # jit: an un-jitted shard_map dispatches eagerly op-by-op (each op its
    # own mini-compile — this alone blew the round-2 dryrun time budget)
    return jax.jit(run)(p, moving, fixed)
