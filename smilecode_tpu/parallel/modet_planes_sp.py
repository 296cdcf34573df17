"""D-sharded ModeT forward on the PLANES fast path.

`parallel/modet_sp.py` shards the flax (NDHWC) graph; this module shards the
planes-layout graph (`models/modet_planes.py`) — the graph the TPU actually
runs — so beyond-HBM volumes get the fast decoder, not its 3.7x-slower twin
(round-2 VERDICT "What's missing" #4). Same registration-as-context-
parallelism treatment (SURVEY.md §2.5), planes edition:

  * encoder: reused from `modet_sp` (per-layer 1-voxel D-halo convs + psum
    InstanceNorm, NDHWC); each level is transposed ONCE into planes, exactly
    like the unsharded planes forward transposes the s2d encoder's output;
  * projections + LayerNorm: local (LN reduces over channels only);
  * neighborhood attention: 1-voxel D halo on K planes, then the fused
    Pallas kernel with `k_prepadded_d=True` (the halo replaces the kernel's
    zero D-border; at the global volume boundary the halo IS zeros, matching
    the reference's `nnf.pad`, `/root/reference/ModeT/models.py:311`);
  * CWM: per-tap einsum convs on a D-haloed block (VALID along D), psum'd
    InstanceNorm, D-halo global-position 2x upsample;
  * warps: all_gather of the SOURCE planes over "spatial" + absolute GLOBAL
    d-coordinates into the v4/v3 relative-shift kernels (their wrappers
    already support source-D != coords-D) — exact for any displacement,
    with the same v4 -> v3 -> oracle guard switch as the unsharded path;
  * flow arithmetic, softmax, qk scale: local.

Forward-only, like `modet_forward_spatial` (training at scale composes DP
via `train.py`'s shard_map with this for inference/eval; a sharded planes
VJP is future work). Equality vs the unsharded planes forward is tested in
`tests/test_modet_planes_sp.py` on the 8-virtual-device CPU mesh.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax import shard_map
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from smilecode_tpu.kernels.modet_attn import modet_attention_planes
from smilecode_tpu.kernels.warp3d_v3 import warp3d_planes_v3
from smilecode_tpu.kernels.warp3d_v4 import warp3d_planes_v4
from smilecode_tpu.models.modet_planes import (
    _interp_take,
    _interp_matrix,
    _planes_coords,
    _violations_from_coords,
    _v4_violations_from_coords,
    _V4_MIN_VOXELS,
    leaky_relu,
    proj_ln_planes,
    to_planes,
    from_planes,
)
from smilecode_tpu.ops.warp import warp_coords
from smilecode_tpu.parallel.modet_sp import _encoder_sp

AXIS = "spatial"

# tests set this to run the Pallas kernels in interpret mode on CPU
_SP_INTERPRET = False


def _halo_d(x, halo: int, axis: int, axis_name: str = AXIS):
    """`spatial.halo_exchange` generalized to any axis (planes tensors keep
    D at axis 2; attention planes at axis 1). Zeros beyond the global
    volume boundary."""
    if halo == 0:
        return x
    n = jax.lax.axis_size(axis_name)
    idx = jax.lax.axis_index(axis_name)
    perm_fwd = [(i, (i + 1) % n) for i in range(n)]
    perm_bwd = [(i, (i - 1) % n) for i in range(n)]
    size = x.shape[axis]
    last = jax.lax.slice_in_dim(x, size - halo, size, axis=axis)
    first = jax.lax.slice_in_dim(x, 0, halo, axis=axis)
    from_prev = jax.lax.ppermute(last, axis_name, perm_fwd)
    from_next = jax.lax.ppermute(first, axis_name, perm_bwd)
    zero = jnp.zeros_like(from_prev)
    from_prev = jnp.where(idx == 0, zero, from_prev)
    from_next = jnp.where(idx == n - 1, zero, from_next)
    return jnp.concatenate([from_prev, x, from_next], axis=axis)


def _instance_norm_planes_sp(x, eps: float = 1e-5):
    """InstanceNorm on planes (B, C, Dl, H, W) with D sharded: psum'd
    per-(B, C) full-volume statistics."""
    local_cnt = x.shape[2] * x.shape[3] * x.shape[4]
    s = jax.lax.psum(jnp.sum(x, axis=(2, 3, 4), keepdims=True), AXIS)
    ss = jax.lax.psum(jnp.sum(x * x, axis=(2, 3, 4), keepdims=True), AXIS)
    cnt = jax.lax.psum(jnp.asarray(local_cnt, x.dtype), AXIS)
    mean = s / cnt
    var = ss / cnt - mean * mean
    return (x - mean) * jax.lax.rsqrt(var + eps)


def conv3_planes_sp(p, x):
    """3^3 SAME conv on D-sharded planes: 1-voxel D halo, then the same
    27-tap channel-mix dots as `modet_planes.conv3_planes`, VALID along D."""
    kern = p["kernel"].astype(x.dtype)
    xh = _halo_d(x, 1, axis=2)
    xp = jnp.pad(xh, ((0, 0), (0, 0), (0, 0), (1, 1), (1, 1)))
    b, c, d, h, w = x.shape
    out = None
    for od in range(3):
        for oh in range(3):
            for ow in range(3):
                sl = jax.lax.slice(
                    xp, (0, 0, od, oh, ow), (b, c, od + d, oh + h, ow + w)
                )
                t = jnp.einsum("co,bcdhw->bodhw", kern[od, oh, ow], sl)
                out = t if out is None else out + t
    return out + p["bias"].reshape(1, -1, 1, 1, 1).astype(x.dtype)


def conv_ins_planes_sp(p, x, alpha=0.1):
    return leaky_relu(_instance_norm_planes_sp(conv3_planes_sp(p["main"], x)), alpha)


def upsample2_planes_sp(x):
    """2x trilinear (align_corners) on D-sharded planes (B, C, Dl, H, W):
    the D axis interpolates at GLOBAL positions through a 1-voxel halo
    (align_corners sample positions cross shard boundaries); H via local
    takes, W via the interpolation-matrix matmul on the lane axis."""
    n = jax.lax.axis_size(AXIS)
    i = jax.lax.axis_index(AXIS)
    b, c, dl, h, w = x.shape
    d_glob = dl * n
    if d_glob == 1:
        up = jnp.concatenate([x, x], axis=2)
    else:
        xh = _halo_d(x, 1, axis=2)  # (b, c, dl+2, h, w)
        dg = i * 2 * dl + jnp.arange(2 * dl)
        pos = dg.astype(x.dtype) * ((d_glob - 1) / (2 * d_glob - 1))
        i0 = jnp.floor(pos)
        t = (pos - i0)[None, None, :, None, None].astype(x.dtype)
        loc0 = i0.astype(jnp.int32) - i * dl + 1  # index into the haloed block
        x0 = jnp.take(xh, jnp.clip(loc0, 0, dl + 1), axis=2)
        x1 = jnp.take(xh, jnp.clip(loc0 + 1, 0, dl + 1), axis=2)
        up = x0 * (1 - t) + x1 * t
    up = _interp_take(up, 2 * h, 3)
    g = jnp.asarray(_interp_matrix(w, 2 * w), up.dtype)
    return jnp.einsum("bcdhw,wv->bcdhv", up, g)


def _attn_planes_sp(rpb, q, k, heads: int, interpret: bool):
    """Fused planes attention with a neighbor-shard D halo on K."""
    kh = _halo_d(k, 1, axis=1)
    out = modet_attention_planes(
        q, kh, rpb, heads, 1.0, interpret=interpret, k_prepadded_d=True
    )
    bh = out.shape[0]
    return out.reshape(bh // heads, heads * 3, *out.shape[2:])


def cwm_planes_sp(p, x, heads: int):
    """`modet_planes.cwm_planes` with sharded-aware upsample/convs/IN."""
    x = upsample2_planes_sp(x)
    wgt = conv_ins_planes_sp(p["conv_0"], x)
    wgt = conv_ins_planes_sp(p["conv_1"], wgt)
    wgt = conv3_planes_sp(p["conv_2"], wgt)
    wgt = jax.nn.softmax(wgt, axis=1)
    b, _, d, h, w = x.shape
    fields = x.reshape(b, heads, 3, d, h, w)
    return 2.0 * jnp.sum(fields * wgt[:, :, None], axis=1)


def warp_planes_sp(src, flow, on_tpu: bool, guarded: bool = True):
    """Warp D-sharded planes src (B, C, Dl, H, W) by a D-sharded planes flow
    (B, 3, Dl, H, W): all_gather the source over "spatial", sample at GLOBAL
    absolute coordinates — exact for any displacement. On TPU the v4/v3
    kernels run per shard (their wrappers accept source-D != coords-D) with
    the same guard switch as the unsharded path; elsewhere (and under the
    guard's last resort) the coordinate oracle."""
    i = jax.lax.axis_index(AXIS)
    b, c, dl, h, w = src.shape
    src_g = jax.lax.all_gather(src, AXIS, axis=2, tiled=True)
    dg = src_g.shape[2]
    cd, ch, cw = _planes_coords(flow, dl, h, w)
    cd = cd + (i * dl).astype(jnp.float32)
    planes = src_g.reshape(b * c, dg, h, w)

    def oracle(pl_, cd_, ch_, cw_):
        coords = jnp.stack([cd_, ch_, cw_], axis=-1).reshape(b, dl * h * w, 3)
        out = warp_coords(
            from_planes(pl_.reshape(b, c, dg, h, w)), coords, (dl, h, w)
        )
        return to_planes(out).reshape(b * c, dl, h, w).astype(jnp.float32)

    if not on_tpu and not _SP_INTERPRET:
        return oracle(planes, cd, ch, cw).reshape(b, c, dl, h, w).astype(src.dtype)

    def v3(pl_, cd_, ch_, cw_):
        return warp3d_planes_v3(pl_, cd_, ch_, cw_, c, _SP_INTERPRET)

    def v4(pl_, cd_, ch_, cw_):
        return warp3d_planes_v4(pl_, cd_, ch_, cw_, c, _SP_INTERPRET)

    big = dl * h * w >= _V4_MIN_VOXELS
    if not guarded:
        out = (v4 if big else v3)(planes, cd, ch, cw)
        return out.reshape(b, c, dl, h, w).astype(src.dtype)

    viol3 = _violations_from_coords(cd, ch, dg, h, w)
    if big:
        viol4 = _v4_violations_from_coords(cd, dg)
        idx = jnp.where(viol4 == 0, 0, jnp.where(viol3 == 0, 1, 2))
        out = jax.lax.switch(idx, [v4, v3, oracle], planes, cd, ch, cw)
    else:
        out = jax.lax.cond(viol3 > 0, oracle, v3, planes, cd, ch, cw)
    return out.reshape(b, c, dl, h, w).astype(src.dtype)


def _modet_forward_planes_local(
    p, moving, fixed, num_heads, head_dim, qk_scale, on_tpu, guarded_warp
):
    """The planes graph (`models/modet_planes.py:374-460`) on local D
    blocks. moving/fixed: NDHWC local blocks."""
    nh = num_heads
    scale = qk_scale or head_dim ** -0.5

    m_feats = _encoder_sp(p["encoder"], moving)
    f_feats = _encoder_sp(p["encoder"], fixed)
    m1, m2, m3, m4, m5 = [to_planes(f) for f in m_feats]
    f1, f2, f3, f4, f5 = [to_planes(f) for f in f_feats]

    # attention always runs the fused kernel (interpret mode off-TPU, like
    # the unsharded planes forward); warps use the oracle off-TPU unless
    # tests force the kernels via _SP_INTERPRET
    attn_interpret = _SP_INTERPRET or not on_tpu

    def attn(level, q, k, heads):
        return _attn_planes_sp(
            p[f"mdt{level}"].get("rpb"), q, k, heads, attn_interpret
        )

    def proj(level, feat, heads):
        return proj_ln_planes(p[f"projblock{level}"], feat, heads, head_dim, 1.0)

    def qscale(x):
        return x * jnp.asarray(scale, x.dtype)

    wp = functools.partial(warp_planes_sp, on_tpu=on_tpu, guarded=guarded_warp)
    f32 = jnp.float32

    # level 5 (1/16)
    w5 = attn(5, qscale(proj(5, f5, nh[0])), proj(5, m5, nh[0]), nh[0])
    flow = cwm_planes_sp(p["cwm5"], w5, nh[0]).astype(f32)

    # level 4 (1/8)
    m4w = wp(m4, flow)
    w4 = attn(4, qscale(proj(4, f4, nh[1])), proj(4, m4w, nh[1]), nh[1])
    w4 = cwm_planes_sp(p["cwm4"], w4, nh[1]).astype(f32)
    flow = wp(upsample2_planes_sp(2 * flow), w4) + w4  # 1/4

    # level 3 (1/4)
    m3w = wp(m3, flow)
    w3 = attn(3, qscale(proj(3, f3, nh[2])), proj(3, m3w, nh[2]), nh[2])
    w3 = cwm_planes_sp(p["cwm3"], w3, nh[2]).astype(f32)
    flow = wp(upsample2_planes_sp(2 * flow), w3) + w3  # 1/2

    # level 2 (1/2): compose THEN upsample (reference quirk)
    m2w = wp(m2, flow)
    w2 = attn(2, qscale(proj(2, f2, nh[3])), proj(2, m2w, nh[3]), nh[3]).astype(f32)
    flow = upsample2_planes_sp(2 * (wp(flow, w2) + w2))  # full res

    # level 1 (full)
    m1w = wp(m1, flow)
    w1 = attn(1, qscale(proj(1, f1, nh[4])), proj(1, m1w, nh[4]), nh[4]).astype(f32)
    flow = wp(flow, w1) + w1

    y_moved = wp(to_planes(moving), flow)
    return from_planes(y_moved), from_planes(flow)


def modet_forward_planes_spatial(
    mesh: Mesh,
    params,
    moving,
    fixed,
    num_heads=(8, 4, 2, 1, 1),
    head_dim: int = 6,
    qk_scale: float | None = 1.0,
    guarded_warp: bool = True,
):
    """ModeT planes forward with D sharded over mesh axis "spatial".

    Same contract as `modet_sp.modet_forward_spatial`: params from
    `ModeT(...).init`, moving/fixed (B, D, H, W, 1) NDHWC with D divisible
    by 16 * n_spatial_shards; returns (y_moved, flow) as global (D-sharded)
    NDHWC arrays — but the decoder is the planes fast path.
    """
    n_sp = mesh.shape[AXIS]
    d = moving.shape[1]
    if d % (16 * n_sp) != 0:
        raise ValueError(f"D={d} must be divisible by 16*{n_sp}")
    p = params["params"] if "params" in params else params
    on_tpu = jax.default_backend() == "tpu"

    spec = P(None, AXIS)
    fwd = functools.partial(
        _modet_forward_planes_local,
        num_heads=tuple(num_heads),
        head_dim=head_dim,
        qk_scale=qk_scale,
        on_tpu=on_tpu,
        guarded_warp=guarded_warp,
    )

    run = shard_map(
        lambda pp, mv, fx: fwd(pp, mv, fx),
        mesh=mesh,
        in_specs=(P(), spec, spec),
        out_specs=(spec, spec),
        check_vma=False,
    )
    p = jax.device_put(p, NamedSharding(mesh, P()))
    moving = jax.device_put(moving, NamedSharding(mesh, spec))
    fixed = jax.device_put(fixed, NamedSharding(mesh, spec))
    # jit: an un-jitted shard_map dispatches eagerly op-by-op (see modet_sp)
    return jax.jit(run)(p, moving, fixed)
