"""ModeT — Motion Decomposition Transformer for deformable registration.

TPU-native re-design of the reference model (`/root/reference/ModeT/models.py:181-412`
and its CUDA twin `/root/reference/ModeT-cu/models.py`): a 5-level shared conv
encoder pyramid on both volumes; per level, linear projections of the fixed
(query) and warped-moving (key) features feed neighborhood attention that emits
per-head 3-vector deformation subfields; a competitive weighting module (CWM)
fuses subfields at the coarse levels; fields compose coarse-to-fine.

Faithfully keeps the reference's quirks that affect numerics:
  * train-time qk scale = 1 (not d^-0.5) — `/root/reference/ModeT/train.py:67`
  * CWM multiplies the fused field by 2 — `/root/reference/ModeT/models.py:275`
  * level-2 composes THEN upsamples (asymmetric vs other levels) —
    `/root/reference/ModeT/models.py:403`
  * levels 1-2 have 1 head and no CWM — `/root/reference/ModeT/models.py:400-408`

Layout: channels-last NDHWC; flow (B, D, H, W, 3) voxel displacements.
"""

from __future__ import annotations

from typing import Sequence

import jax.numpy as jnp
from flax import linen as nn

from smilecode_tpu.ops.attention import neighborhood_attention_3d
from smilecode_tpu.ops.blocks import (
    ConvBlock,
    Conv3d,
    ConvInsBlock,
    Dense,
    LayerNorm,
    normal_init,
)
from smilecode_tpu.ops.resize import avg_pool2, upsample2_trilinear
from smilecode_tpu.ops.warp import warp


class Encoder(nn.Module):
    """5-scale conv pyramid, channels (2c, 4c, 8c, 16c, 32c), AvgPool3d(2)
    downsampling (`/root/reference/ModeT/models.py:181-228`)."""

    first_out_channel: int = 4

    @nn.compact
    def __call__(self, x):
        c = self.first_out_channel
        out0 = ConvBlock(c, name="conv0_0")(x)
        out0 = ConvInsBlock(2 * c, name="conv0_1")(out0)
        out0 = ConvInsBlock(2 * c, name="conv0_2")(out0)

        out1 = avg_pool2(out0)
        out1 = ConvInsBlock(4 * c, name="conv1_1")(out1)
        out1 = ConvInsBlock(4 * c, name="conv1_2")(out1)

        out2 = avg_pool2(out1)
        out2 = ConvInsBlock(8 * c, name="conv2_1")(out2)
        out2 = ConvInsBlock(8 * c, name="conv2_2")(out2)

        out3 = avg_pool2(out2)
        out3 = ConvInsBlock(16 * c, name="conv3_1")(out3)
        out3 = ConvInsBlock(16 * c, name="conv3_2")(out3)

        out4 = avg_pool2(out3)
        out4 = ConvInsBlock(32 * c, name="conv4_1")(out4)
        out4 = ConvInsBlock(32 * c, name="conv4_2")(out4)

        return out0, out1, out2, out3, out4


class ProjectionLayer(nn.Module):
    """Linear proj (weight ~ N(0, 1e-5), bias 0) + LayerNorm
    (`/root/reference/ModeT/models.py:230-241`). Input is already NDHWC."""

    dim: int = 6

    @nn.compact
    def __call__(self, feat):
        feat = Dense(
            self.dim,
            kernel_init=normal_init(1e-5),
            bias_init=nn.initializers.zeros,
            name="proj",
        )(feat)
        return LayerNorm(name="norm")(feat)


class CWM(nn.Module):
    """Competitive weighting: upsample x2 then softmax-weighted fusion of the
    per-head subfields, times 2 (`/root/reference/ModeT/models.py:243-275`)."""

    in_channels: int
    channels: int

    @nn.compact
    def __call__(self, x):
        num_fields = self.in_channels // 3
        x = upsample2_trilinear(x)
        w = ConvInsBlock(self.channels, name="conv_0")(x)
        w = ConvInsBlock(self.channels, name="conv_1")(w)
        w = Conv3d(num_fields, 3, 1, 1, name="conv_2")(w)
        w = nn.softmax(w, axis=-1)
        b, d, h, ww_, _ = x.shape
        fields = x.reshape(b, d, h, ww_, num_fields, 3)
        fused = jnp.sum(fields * w[..., None], axis=-2)
        return 2.0 * fused


class ModeTransformer(nn.Module):
    """Neighborhood attention -> per-head subfields. Holds the RPB parameter
    (zero-init (heads, 3, 3, 3), `/root/reference/ModeT/models.py:292`)."""

    dim: int
    num_heads: int
    qk_scale: float | None = None
    use_rpb: bool = True
    attn_impl: str = "auto"

    @nn.compact
    def __call__(self, q, k):
        head_dim = self.dim // self.num_heads
        scale = self.qk_scale or head_dim ** -0.5
        b, d, h, w, _ = q.shape
        q = q.reshape(b, d, h, w, self.num_heads, head_dim)
        k = k.reshape(b, d, h, w, self.num_heads, head_dim)
        rpb = None
        if self.use_rpb:
            rpb = self.param("rpb", nn.initializers.zeros, (self.num_heads, 3, 3, 3))
        return neighborhood_attention_3d(q, k, rpb, scale=float(scale), impl=self.attn_impl)


class ModeT(nn.Module):
    """Full coarse-to-fine model (`/root/reference/ModeT/models.py:337-412`).

    __call__(moving, fixed) -> (y_moved, flow); volumes (B, D, H, W, 1).
    """

    channels: int = 4
    head_dim: int = 6
    num_heads: Sequence[int] = (8, 4, 2, 1, 1)
    qk_scale: float | None = None  # reference trains with scale=1
    attn_impl: str = "auto"
    # "bfloat16" runs the feature path (encoder, projections, attention
    # inputs, CWM, feature warps) in bf16; flow composition/upsampling and
    # the final image warp stay float32 (flow magnitudes are O(1) voxel, so
    # bf16's ~3 significant digits would quantize displacements by ~0.01
    # voxel — measurable in fold stats). Gate: tests/test_modet.py asserts
    # bf16-vs-f32 flow endpoint agreement.
    compute_dtype: str | None = None

    @nn.compact
    def __call__(self, moving, fixed):
        c = self.channels
        nh = self.num_heads
        cd = jnp.dtype(self.compute_dtype) if self.compute_dtype else None
        moving_c = moving.astype(cd) if cd else moving
        fixed_c = fixed.astype(cd) if cd else fixed
        encoder = Encoder(first_out_channel=c, name="encoder")
        m1, m2, m3, m4, m5 = encoder(moving_c)
        f1, f2, f3, f4, f5 = encoder(fixed_c)

        def proj(level_dim, name):
            return ProjectionLayer(dim=level_dim, name=name)

        def mdt(level_dim, heads, name):
            return ModeTransformer(
                dim=level_dim,
                num_heads=heads,
                qk_scale=self.qk_scale,
                attn_impl=self.attn_impl,
                name=name,
            )

        f32 = jnp.float32

        # level 5 (1/16)
        pb5 = proj(self.head_dim * nh[0], "projblock5")
        w = mdt(self.head_dim * nh[0], nh[0], "mdt5")(pb5(f5), pb5(m5))
        w = CWM(3 * nh[0], 3 * nh[0] * 2, name="cwm5")(w).astype(f32)
        flow = w  # now at 1/8

        # level 4 (1/8)
        m4 = warp(m4, flow)
        pb4 = proj(self.head_dim * nh[1], "projblock4")
        w = mdt(self.head_dim * nh[1], nh[1], "mdt4")(pb4(f4), pb4(m4))
        w = CWM(3 * nh[1], 3 * nh[1] * 2, name="cwm4")(w).astype(f32)
        flow = warp(upsample2_trilinear(2 * flow), w) + w  # at 1/4

        # level 3 (1/4)
        m3 = warp(m3, flow)
        pb3 = proj(self.head_dim * nh[2], "projblock3")
        w = mdt(self.head_dim * nh[2], nh[2], "mdt3")(pb3(f3), pb3(m3))
        w = CWM(3 * nh[2], 3 * nh[2] * 2, name="cwm3")(w).astype(f32)
        flow = warp(upsample2_trilinear(2 * flow), w) + w  # at 1/2

        # level 2 (1/2): single head, no CWM; compose THEN upsample
        m2 = warp(m2, flow)
        pb2 = proj(self.head_dim * nh[3], "projblock2")
        w = mdt(self.head_dim * nh[3], nh[3], "mdt2")(pb2(f2), pb2(m2)).astype(f32)
        flow = upsample2_trilinear(2 * (warp(flow, w) + w))  # at full res

        # level 1 (full res): single head, no CWM
        m1 = warp(m1, flow)
        pb1 = proj(self.head_dim * nh[4], "projblock1")
        w = mdt(self.head_dim * nh[4], nh[4], "mdt1")(pb1(f1), pb1(m1)).astype(f32)
        flow = warp(flow, w) + w

        y_moved = warp(moving, flow)
        return y_moved, flow
