"""Space-to-depth-RESIDENT encoder: the tiny-channel conv fix.

On-chip measurements (round 2): a C=8 full-res 3^3 conv costs 8.4 ms in
either f32 or bf16 — the cost is NOT compute or bandwidth but the 16x
HBM padding of C-minor intermediates (v5e pads the 8-channel minor dim to
128 lanes). Space-to-depth multiplies channels by 8 (pad waste drops to
2x) — but round 1 measured per-conv s2d SLOWER because each conv paid two
full relayouts (`ops/conv_s2d.py`).

This module keeps the volume IN s2d layout across the whole conv chain:

  * a SAME stride-1 3^3 conv on (B, D, H, W, C) equals a SAME 3^3 conv on
    the s2d tensor (B, D/2, H/2, W/2, 8C) with the rearranged kernel
    K3[s, (v,ci), (q,co)] = K[t] where t = 2s + v - q - 1 per axis (zero
    outside [0,3)) — no shifted grid, no inter-conv shuffle;
  * InstanceNorm statistics pool over space AND the 8 position channels of
    each original channel;
  * AvgPool3d(2) becomes a FREE mean over the 8 position channels (one
    s2d block == one pooling window), yielding the next level's volume in
    normal layout.

FLOPs inflate 3.375x ((6/4)^3 — the dense 3-block footprint covers 6
original voxels per axis where 4 are needed), traded for ~8x lane
utilization and ~8x less HBM padding.

Used by the planes-layout ModeT forward for encoder levels 0-2 (levels 3-4
have C >= 64 at tiny volumes where the direct conv is fine). Parity: the
outputs equal `models.modet.Encoder` with the same params
(tests/test_encoder_s2d.py).
"""

from __future__ import annotations

import functools

import numpy as np

import jax
import jax.numpy as jnp

from smilecode_tpu.ops.blocks import leaky_relu


def s2d(x: jax.Array) -> jax.Array:
    """(B, D, H, W, C) -> (B, D/2, H/2, W/2, 8C); channel composite index is
    ((vd*2+vh)*2+vw)*C + c."""
    b, d, h, w, c = x.shape
    xs = x.reshape(b, d // 2, 2, h // 2, 2, w // 2, 2, c)
    xs = xs.transpose(0, 1, 3, 5, 2, 4, 6, 7)
    return xs.reshape(b, d // 2, h // 2, w // 2, 8 * c)


def und2d(y: jax.Array, c: int) -> jax.Array:
    """Inverse of `s2d`: (B, D2, H2, W2, 8C) -> (B, 2*D2, 2*H2, 2*W2, C)."""
    b, d2, h2, w2, _ = y.shape
    y = y.reshape(b, d2, h2, w2, 2, 2, 2, c)
    y = y.transpose(0, 1, 4, 2, 5, 3, 6, 7)
    return y.reshape(b, 2 * d2, 2 * h2, 2 * w2, c)


# ---------------------------------------------------------------- planes I/O
# Round-5 trace: und2d + to_planes cost ~16 ms/fwd as TWO full-volume copies,
# the first landing in a C<=16-minor NDHWC tensor that v5e pads 8-16x in HBM
# (a (160,192,160,8) bf16 feature is 79 MB logical, 1.26 GB padded). These
# entries move between s2d layout and the decoder's planes layout
# (B, C, D, H, W) in ONE transpose whose output is W-minor — unpadded.


def s2d_from_planes(x: jax.Array) -> jax.Array:
    """(B, C, D, H, W) planes -> (B, D/2, H/2, W/2, 8C), same channel
    composite ((vd*2+vh)*2+vw)*C + c as `s2d`."""
    b, c, d, h, w = x.shape
    xs = x.reshape(b, c, d // 2, 2, h // 2, 2, w // 2, 2)
    xs = xs.transpose(0, 2, 4, 6, 3, 5, 7, 1)
    return xs.reshape(b, d // 2, h // 2, w // 2, 8 * c)


def und2d_to_planes(y: jax.Array, c: int) -> jax.Array:
    """(B, D2, H2, W2, 8C) -> planes (B, C, 2D2, 2H2, 2W2) in one copy."""
    b, d2, h2, w2, _ = y.shape
    y = y.reshape(b, d2, h2, w2, 2, 2, 2, c)
    y = y.transpose(0, 7, 1, 4, 2, 5, 3, 6)
    return y.reshape(b, c, 2 * d2, 2 * h2, 2 * w2)


def pool_s2d(xs: jax.Array, c: int) -> jax.Array:
    """AvgPool3d(2) fused with the next level's `s2d`:
    (B, D2, H2, W2, 8C) -> (B, D2/2, H2/2, W2/2, 8C).

    Order matters on-chip: REDUCE FIRST (position-channel mean, 8x shrink),
    then regroup the small pooled tensor. The previous single-expression
    reshape/mean/transpose let XLA relayout the FULL pre-pool tensor before
    reducing — a round-5 trace showed 4.4 ms transpose + 4.0 ms reduce per
    level-0 call (~17 ms/fwd over the 4 call sites) for what is ~0.5 ms of
    bandwidth when the 8x reduction runs first."""
    return s2d(avg_pool2_s2d(xs, c))


@functools.lru_cache(maxsize=None)
def _s2d3_map() -> np.ndarray:
    """One-hot map m[sd, sh, sw, v, q, t]: block-offset tap (s in [0,3) per
    axis, block s-1 relative) x (input parity v, output parity q) ->
    original kernel tap t (27), with t_axis = 2*s + v - q - 1."""
    m = np.zeros((3, 3, 3, 8, 8, 27), np.float32)
    for sd in range(3):
        for sh in range(3):
            for sw in range(3):
                for v in range(8):
                    vd, vh, vw = v >> 2, (v >> 1) & 1, v & 1
                    for q in range(8):
                        qd, qh, qw = q >> 2, (q >> 1) & 1, q & 1
                        td = 2 * sd + vd - qd - 1
                        th = 2 * sh + vh - qh - 1
                        tw = 2 * sw + vw - qw - 1
                        if 0 <= td < 3 and 0 <= th < 3 and 0 <= tw < 3:
                            m[sd, sh, sw, v, q, (td * 3 + th) * 3 + tw] = 1.0
    return m


def s2d3_kernel(kernel: jax.Array) -> jax.Array:
    """(3,3,3,Cin,Cout) -> (3,3,3, 8Cin, 8Cout) resident-s2d kernel."""
    k = kernel.shape[0]
    assert k == 3
    cin, cout = kernel.shape[3], kernel.shape[4]
    m = jnp.asarray(_s2d3_map(), kernel.dtype)
    kflat = kernel.reshape(27, cin, cout)
    out = jnp.einsum("xyzvqt,tio->xyzviqo", m, kflat,
                     precision=jax.lax.Precision.HIGHEST)
    return out.reshape(3, 3, 3, 8 * cin, 8 * cout)


def conv3_s2d(xs: jax.Array, kernel: jax.Array, bias: jax.Array | None) -> jax.Array:
    """SAME 3^3 conv, computed s2d-resident. xs: (B, D2, H2, W2, 8Cin);
    kernel: the ORIGINAL (3,3,3,Cin,Cout) parameter.

    The conv emits f32 (`preferred_element_type`) even for bf16 inputs:
    on-chip this halves the conv time (bf16-out lowering is ~2x slower,
    benchmarks/conv_bench round 5) and the IN stats ride the f32 output;
    callers cast back to the io dtype at the block boundary."""
    k2 = s2d3_kernel(kernel).astype(xs.dtype)
    y = jax.lax.conv_general_dilated(
        xs, k2, (1, 1, 1), [(1, 1)] * 3,
        dimension_numbers=("NDHWC", "DHWIO", "NDHWC"),
        preferred_element_type=jnp.float32,
    )
    if bias is not None:
        y = y + jnp.tile(bias, 8).astype(y.dtype)
    return y


def instance_norm_s2d(xs: jax.Array, cout: int, eps: float = 1e-5) -> jax.Array:
    """torch InstanceNorm3d over the ORIGINAL volume: per (B, c) stats over
    space and the 8 position channels."""
    b, d2, h2, w2, _ = xs.shape
    g = xs.reshape(b, d2, h2, w2, 8, cout)
    mean = jnp.mean(g, axis=(1, 2, 3, 4), keepdims=True)
    var = jnp.var(g, axis=(1, 2, 3, 4), keepdims=True)
    g = (g - mean) * jax.lax.rsqrt(var + eps)
    return g.reshape(b, d2, h2, w2, 8 * cout)


def avg_pool2_s2d(xs: jax.Array, cout: int) -> jax.Array:
    """AvgPool3d(2) == mean over the position channels; output is the next
    level's volume in NORMAL layout (B, D2, H2, W2, Cout)."""
    b, d2, h2, w2, _ = xs.shape
    return xs.reshape(b, d2, h2, w2, 8, cout).mean(axis=4)


def _conv_block_s2d(p, xs, cout, alpha=0.1):
    dt = xs.dtype
    xs = conv3_s2d(xs, p["main"]["kernel"], p["main"]["bias"])
    return leaky_relu(xs, alpha).astype(dt)


def _conv_ins_block_s2d(p, xs, cout, alpha=0.1):
    dt = xs.dtype
    xs = conv3_s2d(xs, p["main"]["kernel"], p["main"]["bias"])
    return leaky_relu(instance_norm_s2d(xs, cout), alpha).astype(dt)


def encoder_s2d_apply(enc_params, x, first_out_channel: int = 4):
    """`models.modet.Encoder` forward with levels 0-2 computed s2d-resident.

    enc_params: the flax param subtree of Encoder. Returns the same 5
    feature volumes (normal NDHWC layout) as `Encoder.__call__`.
    """
    p = enc_params
    c = first_out_channel

    # level 0 (full res, s2d at 1/2 grid)
    xs = s2d(x)
    xs = _conv_block_s2d(p["conv0_0"], xs, c)
    xs = _conv_ins_block_s2d(p["conv0_1"], xs, 2 * c)
    xs = _conv_ins_block_s2d(p["conv0_2"], xs, 2 * c)
    out0 = und2d(xs, 2 * c)
    pooled = avg_pool2_s2d(xs, 2 * c)

    # level 1 (1/2 res, s2d at 1/4 grid)
    xs = s2d(pooled)
    xs = _conv_ins_block_s2d(p["conv1_1"], xs, 4 * c)
    xs = _conv_ins_block_s2d(p["conv1_2"], xs, 4 * c)
    out1 = und2d(xs, 4 * c)
    pooled = avg_pool2_s2d(xs, 4 * c)

    # level 2 (1/4 res, s2d at 1/8 grid)
    xs = s2d(pooled)
    xs = _conv_ins_block_s2d(p["conv2_1"], xs, 8 * c)
    xs = _conv_ins_block_s2d(p["conv2_2"], xs, 8 * c)
    out2 = und2d(xs, 8 * c)
    pooled = avg_pool2_s2d(xs, 8 * c)

    # levels 3-4: direct convs (C >= 64 at small volumes — no pad problem)
    from smilecode_tpu.ops.blocks import instance_norm

    def conv_ins_direct(pp, v, alpha=0.1):
        y = jax.lax.conv_general_dilated(
            v, pp["main"]["kernel"].astype(v.dtype), (1, 1, 1), [(1, 1)] * 3,
            dimension_numbers=("NDHWC", "DHWIO", "NDHWC"),
        ) + pp["main"]["bias"].astype(v.dtype)
        return leaky_relu(instance_norm(y), alpha)

    out3 = conv_ins_direct(p["conv3_1"], pooled)
    out3 = conv_ins_direct(p["conv3_2"], out3)

    b, d, h, w, cc = out3.shape
    pooled4 = out3.reshape(b, d // 2, 2, h // 2, 2, w // 2, 2, cc).mean(axis=(2, 4, 6))
    out4 = conv_ins_direct(p["conv4_1"], pooled4)
    out4 = conv_ins_direct(p["conv4_2"], out4)

    return out0, out1, out2, out3, out4


def _conv_ins_direct(pp, v, alpha=0.1):
    from smilecode_tpu.ops.blocks import instance_norm

    y = jax.lax.conv_general_dilated(
        v, pp["main"]["kernel"].astype(v.dtype), (1, 1, 1), [(1, 1)] * 3,
        dimension_numbers=("NDHWC", "DHWIO", "NDHWC"),
        preferred_element_type=jnp.float32,
    ) + pp["main"]["bias"].astype(jnp.float32)
    return leaky_relu(instance_norm(y), alpha).astype(v.dtype)


def encoder_s2d_planes_apply(enc_params, x_planes, first_out_channel: int = 4):
    """Planes-in / planes-out encoder: same math as `encoder_s2d_apply`, but
    features are emitted directly in the decoder's (B, C, D, H, W) layout and
    the inter-level pool+s2d is one fused copy — no C-minor NDHWC tensor is
    ever materialized at levels 0-2 (round-5 trace: those copies were ~16 ms
    of the 107 ms bf16 forward).

    x_planes: (B, 1, D, H, W). Returns 5 planes-layout feature volumes.
    """
    p = enc_params
    c = first_out_channel

    # level 0 (full res, s2d at 1/2 grid)
    xs = s2d_from_planes(x_planes)
    xs = _conv_block_s2d(p["conv0_0"], xs, c)
    xs = _conv_ins_block_s2d(p["conv0_1"], xs, 2 * c)
    xs = _conv_ins_block_s2d(p["conv0_2"], xs, 2 * c)
    out0 = und2d_to_planes(xs, 2 * c)

    # level 1 (1/2 res, s2d at 1/4 grid)
    xs = pool_s2d(xs, 2 * c)
    xs = _conv_ins_block_s2d(p["conv1_1"], xs, 4 * c)
    xs = _conv_ins_block_s2d(p["conv1_2"], xs, 4 * c)
    out1 = und2d_to_planes(xs, 4 * c)

    # level 2 (1/4 res, s2d at 1/8 grid)
    xs = pool_s2d(xs, 4 * c)
    xs = _conv_ins_block_s2d(p["conv2_1"], xs, 8 * c)
    xs = _conv_ins_block_s2d(p["conv2_2"], xs, 8 * c)
    out2 = und2d_to_planes(xs, 8 * c)

    # levels 3-4: direct NDHWC convs (C >= 64 at tiny volumes), transposed
    # to planes at the end (small tensors)
    pooled = avg_pool2_s2d(xs, 8 * c)
    out3 = _conv_ins_direct(p["conv3_1"], pooled)
    out3 = _conv_ins_direct(p["conv3_2"], out3)

    b, d, h, w, cc = out3.shape
    pooled4 = out3.reshape(b, d // 2, 2, h // 2, 2, w // 2, 2, cc).mean(axis=(2, 4, 6))
    out4 = _conv_ins_direct(p["conv4_1"], pooled4)
    out4 = _conv_ins_direct(p["conv4_2"], out4)

    tp = lambda t: t.transpose(0, 4, 1, 2, 3)
    return out0, out1, out2, tp(out3), tp(out4)
