"""PCNet — dual-encoder pyramid with DFI / NFF fusion blocks.

Parity: `/root/reference/Baseline methods/PCnet/models.py:118-428`.
Two SEPARATE encoders (float/fixed, c=16, 4 levels, plain stride-2 conv +
VoxRes blocks); bottleneck concat; per scale: a velocity head (`reg_conv*`),
a DFI block that upsamples every cached prediction to the current scale,
computes per-field sigmoid 3-channel weights from their concat, sums and
integrates (VecInt); warped float features fuse with fixed + decoder features
through an NFF block (softmax 3-way weighting + SE-style channel attention).
Final: integrate pred0 and compose ``flow = T(wf0, pred0) + pred0``.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
from flax import linen as nn

from smilecode_tpu.ops.blocks import Conv3d, ConvInsBlock, Dense, instance_norm, leaky_relu
from smilecode_tpu.ops.integrate import vecint
from smilecode_tpu.ops.resize import interp_trilinear
from smilecode_tpu.ops.warp import warp


class ResBlock(nn.Module):
    """IN -> LReLU -> conv, residual add, IN -> LReLU
    (`Baseline methods/PCnet/models.py:167-186`)."""

    @nn.compact
    def __call__(self, x):
        c = x.shape[-1]
        out = leaky_relu(instance_norm(x), 0.1)
        out = Conv3d(c, 3, 1, 1, name="conv")(out)
        out = out + x
        return leaky_relu(instance_norm(out), 0.1)


class PCEncoder(nn.Module):
    """ConvInsBlock stem + 3x (plain stride-2 conv + ResBlock)
    (`Baseline methods/PCnet/models.py:189-221`)."""

    first_out_channel: int = 16

    @nn.compact
    def __call__(self, x):
        c = self.first_out_channel
        out0 = ConvInsBlock(c, name="conv0")(x)
        out1 = Conv3d(2 * c, 3, 2, 1, name="conv1_0")(out0)
        out1 = ResBlock(name="conv1_1")(out1)
        out2 = Conv3d(4 * c, 3, 2, 1, name="conv2_0")(out1)
        out2 = ResBlock(name="conv2_1")(out2)
        out3 = Conv3d(8 * c, 3, 2, 1, name="conv3_0")(out2)
        out3 = ResBlock(name="conv3_1")(out3)
        return out0, out1, out2, out3


class UpConvBlockP1(nn.Module):
    """PCnet's UpConvBlock: ConvTranspose3d(k4, s2, padding=1) + IN + LReLU —
    no crop (`Baseline methods/PCnet/models.py:153-165`)."""

    features: int

    @nn.compact
    def __call__(self, x):
        in_ch = x.shape[-1]
        k = 4
        from smilecode_tpu.ops.blocks import torch_uniform_init

        fan_in = self.features * k ** 3
        kernel = self.param("kernel", torch_uniform_init(fan_in), (k, k, k, in_ch, self.features))
        bias = self.param("bias", torch_uniform_init(fan_in), (self.features,))
        # torch ConvTranspose padding=1 removes 1 from each border of the
        # full (VALID) transposed output
        y = jax.lax.conv_general_dilated(
            x,
            jnp.flip(kernel, (0, 1, 2)).astype(x.dtype),
            window_strides=(1, 1, 1),
            padding=[(2, 2)] * 3,  # (k-1) - padding = 3 - 1
            lhs_dilation=(2, 2, 2),
            dimension_numbers=("NDHWC", "DHWIO", "NDHWC"),
        )
        y = y + bias.astype(y.dtype)
        return leaky_relu(instance_norm(y), 0.1)


class DFIBlock(nn.Module):
    """Deformation field integration (`Baseline methods/PCnet/models.py:225-270`)."""

    level: int
    channel: int = 16
    steps: int = 7

    @nn.compact
    def __call__(self, prediction_list):
        c = self.channel
        n = 5 - self.level
        assert len(prediction_list) == n
        cache = []
        for i, p in enumerate(prediction_list):
            f = 2 ** (n - i)
            _, d, h, w, _ = p.shape
            cache.append(interp_trilinear(p, (d * f, h * f, w * f)))
        x = jnp.concatenate(cache, axis=-1)
        x = ConvInsBlock(c * n, name="conv_0")(x)
        x = ConvInsBlock(c * n, name="conv_1")(x)
        field = None
        for i, p in enumerate(cache):
            wmap = jax.nn.sigmoid(Conv3d(3, 3, 1, 1, name=f"weight_conv_{i}")(x))
            contrib = p * wmap
            field = contrib if field is None else field + contrib
        return vecint(field, self.steps)


class ChannelAttention(nn.Module):
    """SE-style with avg+max pooling, shared bias-free MLP
    (`Baseline methods/PCnet/models.py:272-292`)."""

    reduction: int = 8

    @nn.compact
    def __call__(self, x):
        c = x.shape[-1]
        # bias-free shared MLP: implemented with raw params (no bias)
        from smilecode_tpu.ops.blocks import torch_uniform_init

        w1 = self.param("fc1", torch_uniform_init(c), (c, c // self.reduction))
        w2 = self.param("fc2", torch_uniform_init(c // self.reduction), (c // self.reduction, c))
        y_avg = jnp.mean(x, axis=(1, 2, 3))
        y_max = jnp.max(x, axis=(1, 2, 3))

        def mlp(y):
            return jax.nn.relu(y @ w1.astype(y.dtype)) @ w2.astype(y.dtype)

        att = jax.nn.sigmoid(mlp(y_avg) + mlp(y_max))
        return att[:, None, None, None, :]


class NFFBlock(nn.Module):
    """Neighborhood feature fusion (`Baseline methods/PCnet/models.py:294-322`)."""

    @nn.compact
    def __call__(self, fm_a, fm_b, fm_c):
        c3 = fm_a.shape[-1] * 3
        x = jnp.concatenate([fm_a, fm_b, fm_c], axis=-1)
        y = ConvInsBlock(c3, name="conv_0")(x)
        y = ConvInsBlock(c3, name="conv_1")(y)
        wmap = jax.nn.softmax(Conv3d(3, 3, 1, 1, name="weight_conv")(y), axis=-1)
        concat = jnp.concatenate(
            [fm_a * wmap[..., 0:1], fm_b * wmap[..., 1:2], fm_c * wmap[..., 2:3]], axis=-1
        )
        return concat * ChannelAttention(name="channel_attention")(concat)


class PCNet(nn.Module):
    """`Baseline methods/PCnet/models.py:324-428`."""

    channels: int = 16
    flow_multiplier: float = 1.0

    @nn.compact
    def __call__(self, moving, fixed):
        c = self.channels
        f0m, f1m, f2m, f3m = PCEncoder(c, name="encoder_float")(moving)
        f0f, f1f, f2f, f3f = PCEncoder(c, name="encoder_fixed")(fixed)

        bott = jnp.concatenate([f3f, f3m], axis=-1)
        bott = ConvInsBlock(8 * c, name="conv_bottleNeck_0")(bott)
        bott = ConvInsBlock(8 * c, name="conv_bottleNeck_1")(bott)

        cache = []
        # scale 2
        pred3 = Conv3d(3, 3, 1, 1, name="reg_conv3")(bott)
        cache.append(pred3)
        deconv2 = UpConvBlockP1(4 * c, name="upconv2")(bott)
        wf2 = DFIBlock(level=4, name="dfi_2")(cache)
        f2m_w = warp(f2m, wf2)
        concat2 = NFFBlock(name="nff_2")(f2f, f2m_w, deconv2)

        # scale 1
        pred2 = Conv3d(3, 3, 1, 1, name="reg_conv2")(concat2)
        cache.append(pred2)
        deconv1 = UpConvBlockP1(2 * c, name="upconv1")(concat2)
        wf1 = DFIBlock(level=3, name="dfi_1")(cache)
        f1m_w = warp(f1m, wf1)
        concat1 = NFFBlock(name="nff_1")(f1f, f1m_w, deconv1)

        # scale 0
        pred1 = Conv3d(3, 3, 1, 1, name="reg_conv1")(concat1)
        cache.append(pred1)
        deconv0 = UpConvBlockP1(c, name="upconv0")(concat1)
        wf0 = DFIBlock(level=2, name="dfi_0")(cache)
        f0m_w = warp(f0m, wf0)
        concat0 = NFFBlock(name="nff_0")(f0f, f0m_w, deconv0)

        pred0 = Conv3d(c, 3, 1, 1, name="reg_conv0_0")(concat0)
        pred0 = Conv3d(3, 3, 1, 1, name="reg_conv0_1")(pred0)
        pred0 = vecint(pred0, 7)
        flow = warp(wf0, pred0) + pred0

        y_moved = warp(moving, flow)
        return y_moved, flow
