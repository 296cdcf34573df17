"""Planes-layout ModeT forward — the TPU inference fast path.

Round-1 device traces showed ~45% of the 654 ms/pair forward was pure layout
churn: copies/reshapes/concats where NDHWC ops handed tensors to the
W-minor Pallas kernels (attention pre/post transposes, warp pack builds,
CWM minor-axis reshuffles). This module runs the ENTIRE decoder in ONE
layout — channels-first "planes" (B, C, D, H, W) with W minor, the layout
both Pallas kernels already use internally:

  * projections + LayerNorm: one einsum-dot from the NDHWC encoder feature
    straight into (B*heads, D, head_dim, H, W) kernel layout;
  * neighborhood attention: `kernels.modet_attn.modet_attention_planes`
    (planes in, (B*heads, 3, D, H, W) out — no relayout);
  * CWM: per-tap einsum convs + psum-free InstanceNorm on planes;
  * 2x trilinear upsample: cheap takes on D/H + one interpolation-matrix
    matmul on the lane (W) axis (align_corners positions are not polyphase,
    so the lane axis needs a true interpolation contraction — the MXU eats
    it);
  * warps: the channel-batched relative-shift kernels with absolute coords
    built as plane arithmetic — `kernels.warp3d_v4` (whole-plane programs)
    at half-res and above, `kernels.warp3d_v3` (8-row-tile programs) below
    and as the middle guard branch — with an exact naive-gather fallback
    for flows beyond every kernel budget.

Numerics match `models.modet.ModeT` (same params, same graph, same op
semantics); equality is tested in tests/test_modet_planes.py. The path is
DIFFERENTIABLE: attention uses `modet_attention_planes_diff` (fused Pallas
B1/B2 backward, natively planes) and the hardware warp carries a custom VJP
whose d_flow runs the fused v3 adjoint kernel (d_src stays on the oracle's
scatter transpose, dead-code-eliminated when src is a constant) — so
training runs the planes graph too (`train.py fast_path=planes`).

Reference hot path: `/root/reference/ModeT/models.py:337-412`.
"""

from __future__ import annotations

import functools

import numpy as np

import jax
import jax.numpy as jnp

from smilecode_tpu.kernels.modet_attn import modet_attention_planes_diff
from smilecode_tpu.kernels.warp3d_v3 import (
    warp3d_planes_v3,
    warp3d_planes_v3_dflow,
    KD as KD3,
    KHA as KHA3,
    HB,
)
from smilecode_tpu.kernels.warp3d_v4 import (
    warp3d_planes_v4,
    warp3d_planes_v4_dflow,
    KD as KD4,
)


def _round_up(x, m):
    return (x + m - 1) // m * m


# ------------------------------------------------------------ primitives


def to_planes(x):
    """(B, D, H, W, C) -> (B, C, D, H, W)."""
    return x.transpose(0, 4, 1, 2, 3)


def from_planes(x):
    """(B, C, D, H, W) -> (B, D, H, W, C)."""
    return x.transpose(0, 2, 3, 4, 1)


def proj_ln_planes(p, feat, heads: int, hd: int, scale: float = 1.0):
    """Projection + LayerNorm, planes feature (B, C, D, H, W) ->
    (B*heads, D, hd, H, W) — the attention kernel's native layout.

    Matches ProjectionLayer (`models/modet.py:72-86`): y = LN(feat @ W + b),
    LN over the full heads*hd channel; then the qk scale is folded in.
    """
    b, _, d, h, w = feat.shape
    kernel = p["proj"]["kernel"].reshape(-1, heads, hd)
    # dot straight into kernel layout: (b, heads, d, hd, h, w)
    y = jnp.einsum("bcdhw,cnk->bndkhw", feat, kernel.astype(feat.dtype))
    y = y + p["proj"]["bias"].reshape(heads, 1, hd, 1, 1).astype(y.dtype)
    mean = jnp.mean(y, axis=(1, 3), keepdims=True)
    var = jnp.var(y, axis=(1, 3), keepdims=True)
    y = (y - mean) * jax.lax.rsqrt(var + 1e-5)
    y = y * p["norm"]["scale"].reshape(heads, 1, hd, 1, 1).astype(y.dtype)
    y = y + p["norm"]["bias"].reshape(heads, 1, hd, 1, 1).astype(y.dtype)
    if scale != 1.0:
        y = y * jnp.asarray(scale, y.dtype)
    return y.reshape(b * heads, d, hd, h, w)


def conv3_planes(p, x):
    """3^3 SAME conv on planes via 27 per-tap channel-mix dots.

    x: (B, C, D, H, W); kernel param (3, 3, 3, Cin, Cout)."""
    kern = p["kernel"].astype(x.dtype)
    xp = jnp.pad(x, ((0, 0), (0, 0), (1, 1), (1, 1), (1, 1)))
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


def instance_norm_planes(x, eps=1e-5):
    mean = jnp.mean(x, axis=(2, 3, 4), keepdims=True)
    var = jnp.var(x, axis=(2, 3, 4), keepdims=True)
    return (x - mean) * jax.lax.rsqrt(var + eps)


def leaky_relu(x, alpha=0.1):
    return jnp.where(x >= 0, x, alpha * x)


def conv_ins_planes(p, x, alpha=0.1):
    return leaky_relu(instance_norm_planes(conv3_planes(p["main"], x)), alpha)


@functools.lru_cache(maxsize=None)
def _interp_matrix(n_in: int, n_out: int) -> np.ndarray:
    """(n_in, n_out) align_corners linear interpolation matrix."""
    g = np.zeros((n_in, n_out), np.float64)
    if n_in == 1:
        g[0, :] = 1.0
        return g
    pos = np.arange(n_out, dtype=np.float64) * (n_in - 1) / max(n_out - 1, 1)
    i0 = np.clip(np.floor(pos).astype(np.int64), 0, n_in - 1)
    i1 = np.minimum(i0 + 1, n_in - 1)
    t = pos - i0
    for o in range(n_out):
        g[i0[o], o] += 1.0 - t[o]
        g[i1[o], o] += t[o]
    return g


def _interp_take(x, n_out: int, axis: int):
    """align_corners linear interp along a NON-minor axis via two takes."""
    n_in = x.shape[axis]
    if n_in == n_out:
        return x
    if n_in == 1:
        reps = [1] * x.ndim
        reps[axis] = n_out
        return jnp.tile(x, reps)
    pos = np.arange(n_out, dtype=np.float64) * (n_in - 1) / max(n_out - 1, 1)
    i0 = np.clip(np.floor(pos).astype(np.int32), 0, n_in - 1)
    i1 = np.minimum(i0 + 1, n_in - 1)
    t = pos - i0  # f64; cast to the data dtype below
    shape = [1] * x.ndim
    shape[axis] = n_out
    fr = jnp.asarray(t, x.dtype).reshape(shape)
    return jnp.take(x, jnp.asarray(i0), axis=axis) * (1 - fr) + jnp.take(
        x, jnp.asarray(i1), axis=axis
    ) * fr


def upsample2_planes(x):
    """2x trilinear (align_corners) on (B, C, D, H, W): takes on D/H, an
    interpolation-matrix matmul on the minor W axis."""
    b, c, d, h, w = x.shape
    x = _interp_take(x, 2 * d, 2)
    x = _interp_take(x, 2 * h, 3)
    g = jnp.asarray(_interp_matrix(w, 2 * w), x.dtype)
    return jnp.einsum("bcdhw,wv->bcdhv", x, g)


def _warp_planes_ref(src, flow):
    """Oracle-equivalent planes warp (differentiable XLA path): used as the
    backward recompute of the hardware warp and as the CPU path."""
    from smilecode_tpu.ops.warp import warp_coords

    b, c, d, h, w = src.shape
    cd, ch, cw = _planes_coords(flow, d, h, w)
    coords = jnp.stack([cd, ch, cw], axis=-1).reshape(b, d * h * w, 3)
    return to_planes(warp_coords(from_planes(src), coords, (d, h, w)))


def _planes_coords(flow, d, h, w):
    """Absolute sample coords (B, D, H, W) x 3 from a planes flow.

    Coordinate dtype promotes flow's dtype to at least f32 (bf16 flows get
    f32 coords; f64 flows keep f64 so x64 verification runs stay exact)."""
    dt = jnp.promote_types(flow.dtype, jnp.float32)
    base_d = jax.lax.broadcasted_iota(dt, (1, d, h, w), 1)
    base_h = jax.lax.broadcasted_iota(dt, (1, d, h, w), 2)
    base_w = jax.lax.broadcasted_iota(dt, (1, d, h, w), 3)
    fl = flow.astype(dt)
    return base_d + fl[:, 0], base_h + fl[:, 1], base_w + fl[:, 2]


# tests set this to run the v3/v4 kernels in Pallas interpret mode on CPU
_V3_INTERPRET = False

# volumes at/above this size route through the v4 whole-plane kernel first
# (fewer, bigger window DMAs); smaller levels stay on v3 alone — their warps
# are sub-ms and the extra switch branch would only buy compile time
_V4_MIN_VOXELS = 80 * 96 * 80

# wide d-window budget for the second guard branch: realistic smooth flows
# of +-3..13 voxels have per-plane d-cell spreads of ~4..14 (round-4 spread
# probe) — beyond KD4-2=6 but well within 16-2. The candidate-loop cost is
# sized by the per-block data ranges, not the window, so the wide branch on
# a smooth flow costs only the bigger window DMA; without it every real-
# checkpoint-magnitude flow fell through to the scalar-gather oracle
# (~300 ms/warp, the round-3 prod row's 1094 ms).
_KD4_WIDE = 16


@functools.partial(jax.custom_vjp, nondiff_argnums=(2,))
def _warp_planes_hw(src, flow, guarded: bool):
    """Hardware planes warp: the v3 relative-shift kernel at EVERY channel
    count — one program per (batch, d', 8-row) tile serves all C channels
    from a single window DMA, so the per-channel marginal is one roll+fma
    chain (~3.5 ms at full res) instead of v2's repeated crossbar gathers or
    the packed path's 16x-padded row gathers (on-chip at 160x192x160,
    smooth flows: v3 35/56 ms at C=1/8 vs v2 31/~500, packed 96/229).

    At half-res and above (`_V4_MIN_VOXELS`) the guard ladder is
    v4(KD=8) -> v4(KD=16 wide window, for realistic smooth flows of
    +-3..13 voxels whose per-plane d-spread beats the narrow budget) ->
    v3 (per-8-row-tile budgets: covers strong smooth d-GRADIENTS across a
    plane that overflow even the wide window) -> oracle.

    When guarded, flows exceeding every kernel budget fall back to the
    naive-gather oracle (exact, memory-light; the packed path inside a cond
    branch would reserve its multi-GB pack temps)."""
    b, c, d, h, w = src.shape
    cd, ch, cw = _planes_coords(flow, d, h, w)
    planes = src.reshape(b * c, d, h, w)
    big = d * h * w >= _V4_MIN_VOXELS

    def v3(pl_, cd_, ch_, cw_):
        return warp3d_planes_v3(pl_, cd_, ch_, cw_, c, _V3_INTERPRET)

    def v4(pl_, cd_, ch_, cw_):
        return warp3d_planes_v4(pl_, cd_, ch_, cw_, c, _V3_INTERPRET)

    def v4wide(pl_, cd_, ch_, cw_):
        return warp3d_planes_v4(pl_, cd_, ch_, cw_, c, _V3_INTERPRET, _KD4_WIDE)

    if not guarded:
        out = (v4 if big else v3)(planes, cd, ch, cw)
        return out.reshape(b, c, d, h, w).astype(src.dtype)

    def fallback(pl_, cd_, ch_, cw_):
        from smilecode_tpu.ops.warp import warp_coords

        src5 = from_planes(pl_.reshape(b, c, d, h, w))
        coords = jnp.stack([cd_, ch_, cw_], axis=-1).reshape(b, d * h * w, 3)
        out = warp_coords(src5, coords, (d, h, w))
        return to_planes(out).reshape(b * c, d, h, w).astype(jnp.float32)

    viol3 = _violations_from_coords(cd, ch, d, h, w)
    if big:
        viol4 = _v4_violations_from_coords(cd, d)
        viol4w = _v4_violations_from_coords(cd, d, _KD4_WIDE)
        idx = jnp.where(
            viol4 == 0, 0,
            jnp.where(viol4w == 0, 1, jnp.where(viol3 == 0, 2, 3)),
        )
        out = jax.lax.switch(
            idx, [v4, v4wide, v3, fallback], planes, cd, ch, cw
        )
    else:
        out = jax.lax.cond(viol3 > 0, fallback, v3, planes, cd, ch, cw)
    return out.reshape(b, c, d, h, w).astype(src.dtype)


def _warp_hw_fwd(src, flow, guarded):
    return _warp_planes_hw(src, flow, guarded), (src, flow)


def _warp_hw_bwd(guarded, res, g):
    """Fused-kernel adjoint: d_flow via `warp3d_planes_v3_dflow` (the
    derivative-coefficient twin of the forward, same window DMA and shift
    loops — mirrors the reference's native backward split,
    `/root/reference/ModeT-cu/modet/modet_kernel.cu:318-381`); d_src via the
    oracle's linear transpose (XLA scatter-add). When src is a non-diff
    constant (the final moving-image warp) XLA dead-code-eliminates the
    scatter, so only the kernel runs. Under the guard, wild flows route the
    WHOLE adjoint through the oracle VJP so fwd/bwd always agree."""
    src, flow = res
    b, c, d, h, w = src.shape
    cd, ch, cw = _planes_coords(flow, d, h, w)
    planes = src.reshape(b * c, d, h, w)
    gp = g.astype(jnp.float32).reshape(b * c, d, h, w)
    big = d * h * w >= _V4_MIN_VOXELS

    def _kernel_bwd(dflow_fn, src_, flow_, g_):
        dcd, dch, dcw = dflow_fn(planes, cd, ch, cw, gp, c, _V3_INTERPRET)
        d_flow = jnp.stack([dcd, dch, dcw], axis=1)
        # d_src = transpose of the gather; only the src-cotangent is used
        # so jax materializes just the scatter half of the oracle VJP
        _, vjp = jax.vjp(lambda s: _warp_planes_ref(s, flow_), src_)
        (d_src,) = vjp(g_)
        return d_src, d_flow.astype(flow_.dtype)

    kernel_bwd_v3 = functools.partial(_kernel_bwd, warp3d_planes_v3_dflow)
    kernel_bwd_v4 = functools.partial(_kernel_bwd, warp3d_planes_v4_dflow)
    kernel_bwd_v4w = functools.partial(
        _kernel_bwd,
        functools.partial(warp3d_planes_v4_dflow, kd=_KD4_WIDE),
    )

    def oracle_bwd(src_, flow_, g_):
        _, vjp = jax.vjp(_warp_planes_ref, src_, flow_)
        d_src, d_flow = vjp(g_)
        return d_src, d_flow

    if not guarded:
        return (kernel_bwd_v4 if big else kernel_bwd_v3)(src, flow, g)

    viol3 = _violations_from_coords(cd, ch, d, h, w)
    if big:
        viol4 = _v4_violations_from_coords(cd, d)
        viol4w = _v4_violations_from_coords(cd, d, _KD4_WIDE)
        idx = jnp.where(
            viol4 == 0, 0,
            jnp.where(viol4w == 0, 1, jnp.where(viol3 == 0, 2, 3)),
        )
        return jax.lax.switch(
            idx, [kernel_bwd_v4, kernel_bwd_v4w, kernel_bwd_v3, oracle_bwd],
            src, flow, g,
        )
    return jax.lax.cond(viol3 > 0, oracle_bwd, kernel_bwd_v3, src, flow, g)


_warp_planes_hw.defvjp(_warp_hw_fwd, _warp_hw_bwd)


def warp_planes(src, flow, on_tpu: bool, guarded: bool = True):
    """Warp planes src (B, C, D, H, W) by planes flow (B, 3, D, H, W).

    TPU: windowed kernel on planes (custom VJP via the oracle warp); when
    guarded, a violation check routes wild flows through the exact packed
    path instead. CPU/other: oracle path (used by the equality tests)."""
    if not on_tpu:
        return _warp_planes_ref(src, flow)
    return _warp_planes_hw(src, flow, guarded)


def _violations_from_coords(cd, ch, sd, sh, sw):
    """Tile (d, h) cell-spread violation count against the v3 window budget
    (mirrors `kernels.warp3d_v3.warp_v3_window_violations`)."""
    b, fd, fh, fw = cd.shape
    celld = jnp.floor(cd)
    cellh = jnp.floor(ch)
    fhp = _round_up(fh, HB)
    celld = jnp.pad(celld, ((0, 0), (0, 0), (0, fhp - fh), (0, 0)), mode="edge")
    cellh = jnp.pad(cellh, ((0, 0), (0, 0), (0, fhp - fh), (0, 0)), mode="edge")
    celld = celld.reshape(b, fd, fhp // HB, HB * fw)
    cellh = cellh.reshape(b, fd, fhp // HB, HB * fw)
    d_spread = jnp.max(celld, -1) - jnp.min(celld, -1)
    h_spread = jnp.max(cellh, -1) - jnp.min(cellh, -1)
    bad = (d_spread > KD3 - 2) | (h_spread > KHA3 - 10)
    return jnp.sum(bad.astype(jnp.int32))


def _v4_violations_from_coords(cd, sd, kd: int = KD4):
    """Count of (b, d') planes whose d-cell spread exceeds the v4 window
    budget ``kd`` (mirrors `kernels.warp3d_v4.warp_v4_window_violations`; v4
    has no h/w budget — the whole padded H extent rides in its window)."""
    b, fd, fh, fw = cd.shape
    celld = jnp.floor(cd).reshape(b, fd, fh * fw)
    d_spread = jnp.max(celld, -1) - jnp.min(celld, -1)
    return jnp.sum((d_spread > kd - 2).astype(jnp.int32))


def cwm_planes(p, x, heads: int):
    """Competitive weighting on planes (`models/modet.py:89-107`):
    upsample2, two ConvIns blocks + weight conv, softmax over the per-head
    fields, weighted sum, x2. x: (B, heads*3, D, H, W)."""
    x = upsample2_planes(x)
    wgt = conv_ins_planes(p["conv_0"], x)
    wgt = conv_ins_planes(p["conv_1"], wgt)
    wgt = conv3_planes(p["conv_2"], wgt)  # (B, heads, D, H, W)
    wgt = jax.nn.softmax(wgt, axis=1)
    bsz, _, d, h, w = x.shape
    fields = x.reshape(bsz, heads, 3, d, h, w)
    fused = jnp.sum(fields * wgt[:, :, None], axis=1)
    return 2.0 * fused  # (B, 3, D, H, W)


# ------------------------------------------------------------ forward


def modet_forward_planes(
    params,
    moving,
    fixed,
    channels: int = 4,
    head_dim: int = 6,
    num_heads=(8, 4, 2, 1, 1),
    qk_scale: float | None = 1.0,
    compute_dtype=None,
    guarded_warp: bool = True,
    hw_warp: bool | None = None,
):
    """Full ModeT forward in planes layout. Same contract as
    `ModeT.__call__`: (moving, fixed) NDHWC -> (y_moved, flow) NDHWC.

    hw_warp: None picks the backend from the platform (kernels on TPU,
    oracle elsewhere); True/False force it. bench.py's bf16 gate runs the
    same graph twice (kernels vs oracle) to isolate on-chip kernel error
    from the feature path's intrinsic bf16 noise."""
    on_tpu = jax.default_backend() == "tpu" if hw_warp is None else hw_warp
    p = params["params"] if "params" in params else params
    nh = tuple(num_heads)
    scale = qk_scale or head_dim ** -0.5
    cd = jnp.dtype(compute_dtype) if compute_dtype else None

    # encoder: s2d-resident conv chain (kills the 16x HBM padding of tiny-
    # channel C-minor conv intermediates; see ops/encoder_s2d.py) when the
    # volume dims allow; features are transposed ONCE per level into planes
    mv_in = moving.astype(cd) if cd else moving
    fx_in = fixed.astype(cd) if cd else fixed
    dims_ok = all(s % 8 == 0 for s in moving.shape[1:4])
    if dims_ok:
        from smilecode_tpu.ops.encoder_s2d import encoder_s2d_planes_apply

        # NDHWC (B,D,H,W,1) -> planes (B,1,D,H,W) is a pure reshape (C=1);
        # the planes-native encoder then emits planes features directly
        enc_apply = functools.partial(
            encoder_s2d_planes_apply, p["encoder"], first_out_channel=channels
        )
        m1, m2, m3, m4, m5 = enc_apply(jnp.moveaxis(mv_in, -1, 1))
        f1, f2, f3, f4, f5 = enc_apply(jnp.moveaxis(fx_in, -1, 1))
    else:
        from smilecode_tpu.models.modet import Encoder

        enc = Encoder(first_out_channel=channels)
        m_feats = enc.apply({"params": p["encoder"]}, mv_in)
        f_feats = enc.apply({"params": p["encoder"]}, fx_in)
        m1, m2, m3, m4, m5 = [to_planes(f) for f in m_feats]
        f1, f2, f3, f4, f5 = [to_planes(f) for f in f_feats]

    def attn(level, q, k, heads):
        out = modet_attention_planes_diff(
            q, k, p[f"mdt{level}"].get("rpb"), heads, 1.0, not on_tpu
        )
        bh = out.shape[0]
        return out.reshape(bh // heads, heads * 3, *out.shape[2:])

    def proj(level, feat, heads):
        return proj_ln_planes(p[f"projblock{level}"], feat, heads, head_dim, 1.0)

    wp = functools.partial(warp_planes, on_tpu=on_tpu, guarded=guarded_warp)
    # flow accumulates in (at least) f32 even on the bf16 feature path; f64
    # inputs keep f64 flows so x64 verification runs stay exact
    f32 = jnp.promote_types(moving.dtype, jnp.float32)

    def qscale(x):
        return x * jnp.asarray(scale, x.dtype)

    # the attention kernel emits f32; CWM convs run in the feature compute
    # dtype (bf16 on the bf16 path — round-5 trace: f32 CWM dots were 9 ms)
    # while the fused flow they produce accumulates back in f32
    feat_dt = m5.dtype

    # level 5 (1/16)
    w5 = attn(5, qscale(proj(5, f5, nh[0])), proj(5, m5, nh[0]), nh[0])
    flow = cwm_planes(p["cwm5"], w5.astype(feat_dt), nh[0]).astype(f32)

    # level 4 (1/8)
    m4w = wp(m4, flow)
    w4 = attn(4, qscale(proj(4, f4, nh[1])), proj(4, m4w, nh[1]), nh[1])
    w4 = cwm_planes(p["cwm4"], w4.astype(feat_dt), nh[1]).astype(f32)
    flow = wp(upsample2_planes(2 * flow), w4) + w4  # 1/4

    # level 3 (1/4)
    m3w = wp(m3, flow)
    w3 = attn(3, qscale(proj(3, f3, nh[2])), proj(3, m3w, nh[2]), nh[2])
    w3 = cwm_planes(p["cwm3"], w3.astype(feat_dt), nh[2]).astype(f32)
    flow = wp(upsample2_planes(2 * flow), w3) + w3  # 1/2

    # level 2 (1/2): compose THEN upsample (reference quirk)
    m2w = wp(m2, flow)
    w2 = attn(2, qscale(proj(2, f2, nh[3])), proj(2, m2w, nh[3]), nh[3]).astype(f32)
    flow = upsample2_planes(2 * (wp(flow, w2) + w2))  # full res

    # level 1 (full)
    m1w = wp(m1, flow)
    w1 = attn(1, qscale(proj(1, f1, nh[4])), proj(1, m1w, nh[4]), nh[4]).astype(f32)
    flow = wp(flow, w1) + w1

    mv_planes = to_planes(moving)
    y_moved = wp(mv_planes, flow)
    return from_planes(y_moved), from_planes(flow)