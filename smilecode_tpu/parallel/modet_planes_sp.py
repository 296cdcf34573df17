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

DIFFERENTIABLE end to end — training beyond one chip's HBM runs this graph:
the sharded warp carries a custom VJP (fused dflow kernels at global
coordinates; d_src through the all_gather transpose = psum_scatter), the
fused attention backward emits halo-slab k cotangents (`k_prepadded_d`)
that ride the ppermute transpose home, and `modet_train_loss_spatial`
computes NCC+Grad3d with D-halos and psum'd statistics. Equality vs the
unsharded planes forward AND its gradients is tested in
`tests/test_modet_planes_sp.py` on the 8-virtual-device CPU mesh.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax import shard_map
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from smilecode_tpu.kernels.modet_attn import modet_attention_planes_diff
from smilecode_tpu.kernels.warp3d_v3 import (
    warp3d_planes_v3,
    warp3d_planes_v3_dflow,
)
from smilecode_tpu.kernels.warp3d_v4 import (
    warp3d_planes_v4,
    warp3d_planes_v4_dflow,
)
from smilecode_tpu.models.modet_planes import (
    _interp_take,
    _interp_matrix,
    _planes_coords,
    _violations_from_coords,
    _v4_violations_from_coords,
    _V4_MIN_VOXELS,
    _KD4_WIDE,
    leaky_relu,
    proj_ln_planes,
    to_planes,
    from_planes,
)
from smilecode_tpu.ops.warp import warp_coords
from smilecode_tpu.parallel.modet_sp import _encoder_sp
from smilecode_tpu.parallel.spatial import halo_exchange

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
    """Fused planes attention with a neighbor-shard D halo on K.

    Differentiable: the diff entry's fused backward emits k cotangents for
    the full D+2 prepadded extent (`modet_attn._backward_planes`
    k_prepadded_d), which ride the halo exchange's ppermute transpose back
    to the neighbor shards."""
    kh = _halo_d(k, 1, axis=1)
    out = modet_attention_planes_diff(q, kh, rpb, heads, 1.0, interpret, True)
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


def _sp_global_coords(flow, dl, h, w):
    """Absolute GLOBAL sample coords from a D-sharded planes flow."""
    i = jax.lax.axis_index(AXIS)
    cd, ch, cw = _planes_coords(flow, dl, h, w)
    return cd + (i * dl).astype(cd.dtype), ch, cw


def _warp_sp_oracle(src, flow):
    """Differentiable all-gather oracle warp on D-sharded planes: the VJP's
    d_src is the transpose of the all_gather + gather chain, so XLA inserts
    the psum_scatter that routes cross-shard source cotangents home."""
    b, c, dl, h, w = src.shape
    src_g = jax.lax.all_gather(src, AXIS, axis=2, tiled=True)
    cd, ch, cw = _sp_global_coords(flow, dl, h, w)
    coords = jnp.stack([cd, ch, cw], axis=-1).reshape(b, dl * h * w, 3)
    out = warp_coords(from_planes(src_g), coords, (dl, h, w))
    return to_planes(out).astype(src.dtype)


@functools.partial(jax.custom_vjp, nondiff_argnums=(2,))
def _warp_sp_hw(src, flow, guarded: bool):
    """Kernel path of the sharded planes warp: all_gather the source, run
    the v4/v3 relative-shift kernels per shard at GLOBAL coordinates (their
    wrappers accept source-D != coords-D), same guard switch as the
    unsharded `models.modet_planes._warp_planes_hw`."""
    b, c, dl, h, w = src.shape
    src_g = jax.lax.all_gather(src, AXIS, axis=2, tiled=True)
    dg = src_g.shape[2]
    cd, ch, cw = _sp_global_coords(flow, dl, h, w)
    planes = src_g.reshape(b * c, dg, h, w)

    def oracle(pl_, cd_, ch_, cw_):
        coords = jnp.stack([cd_, ch_, cw_], axis=-1).reshape(b, dl * h * w, 3)
        out = warp_coords(
            from_planes(pl_.reshape(b, c, dg, h, w)), coords, (dl, h, w)
        )
        return to_planes(out).reshape(b * c, dl, h, w).astype(jnp.float32)

    def v3(pl_, cd_, ch_, cw_):
        return warp3d_planes_v3(pl_, cd_, ch_, cw_, c, _SP_INTERPRET)

    def v4(pl_, cd_, ch_, cw_):
        return warp3d_planes_v4(pl_, cd_, ch_, cw_, c, _SP_INTERPRET)

    def v4wide(pl_, cd_, ch_, cw_):
        return warp3d_planes_v4(pl_, cd_, ch_, cw_, c, _SP_INTERPRET, _KD4_WIDE)

    big = dl * h * w >= _V4_MIN_VOXELS
    if not guarded:
        out = (v4 if big else v3)(planes, cd, ch, cw)
        return out.reshape(b, c, dl, h, w).astype(src.dtype)

    # GLOBAL violation counts: every shard must take the same branch (the
    # adjoint branches contain collectives, and fwd/bwd must agree)
    viol3 = jax.lax.psum(_violations_from_coords(cd, ch, dg, h, w), AXIS)
    if big:
        viol4 = jax.lax.psum(_v4_violations_from_coords(cd, dg), AXIS)
        viol4w = jax.lax.psum(
            _v4_violations_from_coords(cd, dg, _KD4_WIDE), AXIS
        )
        idx = jnp.where(
            viol4 == 0, 0,
            jnp.where(viol4w == 0, 1, jnp.where(viol3 == 0, 2, 3)),
        )
        out = jax.lax.switch(
            idx, [v4, v4wide, v3, oracle], planes, cd, ch, cw
        )
    else:
        out = jax.lax.cond(viol3 > 0, oracle, v3, planes, cd, ch, cw)
    return out.reshape(b, c, dl, h, w).astype(src.dtype)


def _warp_sp_hw_fwd(src, flow, guarded):
    return _warp_sp_hw(src, flow, guarded), (src, flow)


def _warp_sp_hw_bwd(guarded, res, g):
    """Sharded warp adjoint: d_flow via the fused dflow kernels at GLOBAL
    coordinates on the gathered source (local output, no collective); d_src
    via the oracle chain's linear transpose, whose all_gather transposes to
    the psum_scatter that returns cross-shard cotangents. Under the guard,
    wild flows route the whole adjoint through the oracle VJP so fwd/bwd
    always agree (same policy as the unsharded path)."""
    src, flow = res
    b, c, dl, h, w = src.shape
    src_g = jax.lax.all_gather(src, AXIS, axis=2, tiled=True)
    dg = src_g.shape[2]
    cd, ch, cw = _sp_global_coords(flow, dl, h, w)
    planes = src_g.reshape(b * c, dg, h, w)
    gp = g.astype(jnp.float32).reshape(b * c, dl, h, w)
    big = dl * h * w >= _V4_MIN_VOXELS

    def _kernel_bwd(dflow_fn, src_, flow_, g_):
        dcd, dch, dcw = dflow_fn(planes, cd, ch, cw, gp, c, _SP_INTERPRET)
        d_flow = jnp.stack([dcd, dch, dcw], axis=1)
        _, vjp = jax.vjp(lambda s: _warp_sp_oracle(s, flow_), src_)
        (d_src,) = vjp(g_.astype(src_.dtype))
        return d_src, d_flow.astype(flow_.dtype)

    kernel_bwd_v3 = functools.partial(_kernel_bwd, warp3d_planes_v3_dflow)
    kernel_bwd_v4 = functools.partial(_kernel_bwd, warp3d_planes_v4_dflow)
    kernel_bwd_v4w = functools.partial(
        _kernel_bwd,
        functools.partial(warp3d_planes_v4_dflow, kd=_KD4_WIDE),
    )

    def oracle_bwd(src_, flow_, g_):
        _, vjp = jax.vjp(_warp_sp_oracle, src_, flow_)
        d_src, d_flow = vjp(g_.astype(src_.dtype))
        return d_src, d_flow

    if not guarded:
        return (kernel_bwd_v4 if big else kernel_bwd_v3)(src, flow, g)

    viol3 = jax.lax.psum(_violations_from_coords(cd, ch, dg, h, w), AXIS)
    if big:
        viol4 = jax.lax.psum(_v4_violations_from_coords(cd, dg), AXIS)
        viol4w = jax.lax.psum(
            _v4_violations_from_coords(cd, dg, _KD4_WIDE), AXIS
        )
        idx = jnp.where(
            viol4 == 0, 0,
            jnp.where(viol4w == 0, 1, jnp.where(viol3 == 0, 2, 3)),
        )
        return jax.lax.switch(
            idx, [kernel_bwd_v4, kernel_bwd_v4w, kernel_bwd_v3, oracle_bwd],
            src, flow, g,
        )
    return jax.lax.cond(viol3 > 0, oracle_bwd, kernel_bwd_v3, src, flow, g)


_warp_sp_hw.defvjp(_warp_sp_hw_fwd, _warp_sp_hw_bwd)


def warp_planes_sp(src, flow, on_tpu: bool, guarded: bool = True):
    """Warp D-sharded planes src (B, C, Dl, H, W) by a D-sharded planes flow
    (B, 3, Dl, H, W): all_gather the source over "spatial", sample at GLOBAL
    absolute coordinates — exact for any displacement. On TPU the v4/v3
    kernels run per shard with the same guard switch as the unsharded path
    (differentiable via the fused-dflow custom VJP); elsewhere the
    differentiable coordinate oracle."""
    if not on_tpu and not _SP_INTERPRET:
        return _warp_sp_oracle(src, flow)
    return _warp_sp_hw(src, flow, guarded)


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
    # at least f32 (see models/modet_planes.py); f64 inputs keep f64 flows
    f32 = jnp.promote_types(moving.dtype, jnp.float32)

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


# ------------------------------------------------------- sharded training


def _box_sum_axis_prepadded(x, win: int, size: int, axis: int):
    """`losses.core._box_sum_axis` on an input that ALREADY carries its
    win//2 padding along ``axis`` (here: a neighbor-shard halo)."""
    out = None
    for o in range(win):
        sl = jax.lax.slice_in_dim(x, o, o + size, axis=axis)
        out = sl if out is None else out + sl
    return out


def ncc_sp(y_true, y_pred, win: int = 9):
    """`losses.core.ncc_vxm` with the D axis sharded: both volumes get a
    win//2 D-halo (zeros at the global boundary == the unsharded zero pad),
    the D box sum runs VALID on the haloed block, H/W stay local.

    Returns this shard's CONTRIBUTION to the global loss (local cc sum over
    the GLOBAL voxel count, negated): psum over "spatial" gives the global
    value, and gradients of the un-psum'd contribution compose correctly
    with a final grads-psum (the halo ppermutes transpose inside).
    """
    from smilecode_tpu.losses.core import _box_sum_axis

    pad = win // 2
    n = jax.lax.axis_size(AXIS)
    b, dl, h, w, c = y_true.shape
    ii = halo_exchange(y_true, pad, AXIS)
    ji = halo_exchange(y_pred, pad, AXIS)

    def box(x):
        x = _box_sum_axis_prepadded(x, win, dl, 1)
        x = _box_sum_axis(x, win, 2)
        return _box_sum_axis(x, win, 3)

    i_sum = box(ii)
    j_sum = box(ji)
    i2_sum = box(ii * ii)
    j2_sum = box(ji * ji)
    ij_sum = box(ii * ji)
    win_size = float(win ** 3)
    u_i = i_sum / win_size
    u_j = j_sum / win_size
    cross = ij_sum - u_j * i_sum - u_i * j_sum + u_i * u_j * win_size
    i_var = i2_sum - 2 * u_i * i_sum + u_i * u_i * win_size
    j_var = j2_sum - 2 * u_j * j_sum + u_j * u_j * win_size
    cc = cross * cross / (i_var * j_var + 1e-5)
    return -jnp.sum(cc) / (b * dl * n * h * w * c)


def grad3d_sp(flow, penalty: str = "l1", loss_mult=None):
    """`losses.core.grad3d` with the D axis sharded: the D forward
    difference crosses the shard boundary through a 1-voxel halo; the
    spurious diff at the global end is masked out. Returns this shard's
    contribution (see `ncc_sp`)."""
    n = jax.lax.axis_size(AXIS)
    i = jax.lax.axis_index(AXIS)
    b, dl, h, w, c = flow.shape
    d_glob = dl * n
    xh = halo_exchange(flow, 1, AXIS)
    dd = jnp.abs(xh[:, 2:] - xh[:, 1:-1])
    dh = jnp.abs(flow[:, :, 1:] - flow[:, :, :-1])
    dw = jnp.abs(flow[:, :, :, 1:] - flow[:, :, :, :-1])
    if penalty == "l2":
        dd, dh, dw = dd * dd, dh * dh, dw * dw
    elif penalty != "l1":
        raise ValueError(f"penalty must be l1 or l2, got {penalty!r}")
    # drop the diff against the zero halo at the global end
    is_real = (i < n - 1) | (
        jax.lax.broadcasted_iota(jnp.int32, (1, dl, 1, 1, 1), 1) < dl - 1
    )
    dd = jnp.where(is_real, dd, 0.0)
    g = (
        jnp.sum(dd) / (b * (d_glob - 1) * h * w * c)
        + jnp.sum(dh) / (b * d_glob * (h - 1) * w * c)
        + jnp.sum(dw) / (b * d_glob * h * (w - 1) * c)
    ) / 3.0
    if loss_mult is not None:
        g = g * loss_mult
    return g


def make_spatial_loss_and_grads(
    mesh: Mesh,
    num_heads=(8, 4, 2, 1, 1),
    head_dim: int = 6,
    qk_scale: float | None = 1.0,
    weights=(1.0, 1.0),
    guarded_warp: bool = True,
    data_axis: str = "data",
):
    """shard_map'd ``(params, moving, fixed) -> ((loss, (sim, reg)), grads)``
    of the reference training objective — NCC(9^3) + L2-diffusion Grad3d
    (`/root/reference/ModeT/train.py:101-104`) — through the D-sharded
    PLANES forward. The full backward runs sharded: halo transposes
    (ppermute), psum-IN/LN backward, fused attention backward with halo-slab
    k cotangents, and the sharded warp custom VJP.

    Composes with data parallelism: when the mesh has a ``data_axis`` > 1,
    the batch axis is sharded over it and losses/grads are pmean-reduced
    (same semantics as `train.make_train_step`'s DP path), on top of the
    spatial psum. Grads equal the unsharded gradient of the global batch
    mean. NOT jitted — compose into a donated train step (params replicated
    on ``mesh``, volumes placed ``P(data?, "spatial")`` along (B, D))."""
    on_tpu = jax.default_backend() == "tpu"
    fwd = functools.partial(
        _modet_forward_planes_local,
        num_heads=tuple(num_heads),
        head_dim=head_dim,
        qk_scale=qk_scale,
        on_tpu=on_tpu,
        guarded_warp=guarded_warp,
    )
    has_dp = data_axis in mesh.axis_names and mesh.shape[data_axis] > 1

    def local_loss(pp, mv, fx):
        moved, flow = fwd(pp, mv, fx)
        sim = ncc_sp(fx, moved) * weights[0]
        reg = grad3d_sp(flow, penalty="l2") * weights[1]
        return sim + reg, (sim, reg)

    def local_lg(pp, mv, fx):
        (loss, aux), grads = jax.value_and_grad(local_loss, has_aux=True)(
            pp, mv, fx
        )
        # each spatial shard's grad holds d(its contribution)/d(params)
        # including cross-shard flows (ppermute/all_gather transposes ran
        # inside); the global gradient is their sum
        loss, aux = jax.tree.map(lambda v: jax.lax.psum(v, AXIS), (loss, aux))
        grads = jax.tree.map(lambda g: jax.lax.psum(g, AXIS), grads)
        if has_dp:
            loss, aux = jax.tree.map(
                lambda v: jax.lax.pmean(v, data_axis), (loss, aux)
            )
            grads = jax.tree.map(lambda g: jax.lax.pmean(g, data_axis), grads)
        return (loss, aux), grads

    vol_spec = P(data_axis, AXIS) if has_dp else P(None, AXIS)
    return shard_map(
        local_lg,
        mesh=mesh,
        in_specs=(P(), vol_spec, vol_spec),
        out_specs=((P(), (P(), P())), P()),
        check_vma=False,
    ), vol_spec


def modet_train_loss_spatial(
    mesh: Mesh,
    params,
    moving,
    fixed,
    num_heads=(8, 4, 2, 1, 1),
    head_dim: int = 6,
    qk_scale: float | None = 1.0,
    weights=(1.0, 1.0),
    guarded_warp: bool = True,
):
    """One-shot (loss, grads) through the D-sharded planes training graph
    (see `make_spatial_loss_and_grads`; this convenience wrapper places the
    inputs and jits — use the factory inside a train loop)."""
    n_sp = mesh.shape[AXIS]
    d = moving.shape[1]
    if d % (16 * n_sp) != 0:
        raise ValueError(f"D={d} must be divisible by 16*{n_sp}")
    p = params["params"] if "params" in params else params
    run, vol_spec = make_spatial_loss_and_grads(
        mesh, num_heads, head_dim, qk_scale, weights, guarded_warp
    )
    p = jax.device_put(p, NamedSharding(mesh, P()))
    moving = jax.device_put(moving, NamedSharding(mesh, vol_spec))
    fixed = jax.device_put(fixed, NamedSharding(mesh, vol_spec))
    (loss, _aux), grads = jax.jit(run)(p, moving, fixed)
    return loss, grads
