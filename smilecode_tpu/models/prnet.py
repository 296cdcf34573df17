"""PRNet / PRNet++ — dual-stream pyramid with progressive refinement.

Parity: `/root/reference/Baseline methods/PR++/models.py:113-352`.
Shared `BackBone`: 5-level ReLU conv encoder (c=8) + nearest-upsample U-Net
decoder applied to x and y separately, yielding 5-scale feature lists
(1/8, 1/4, 1/2, full, full). PRBlock warps the x features with the upsampled
(2x-scaled) incoming flow and predicts a residual flow from the concat with a
N(0,1e-5) conv. PR++Block adds a windowed `Correlation3D` (box-filtered
27-shift correlation with the reference's asymmetric {-3,-1,1} offsets) and
two conv stacks with a residual connection.

PRNet composes all 5 flows at the end; PR++ composes progressively as
``flow = T(flow, w) + w`` — note T warps the LOWER-res flow through the
higher-res field (grid_sample normalized-coordinate upsampling, NO 2x
magnitude rescale: reference quirk preserved, models.py:330-344).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
from flax import linen as nn

from smilecode_tpu.ops.blocks import Conv3d, normal_init
from smilecode_tpu.ops.resize import upsample2_nearest, upsample2_trilinear
from smilecode_tpu.ops.warp import warp


class ReluConvBlock(nn.Module):
    """Conv3d + ReLU (`Baseline methods/PR++/models.py:113-127`)."""

    features: int
    stride: int = 1

    @nn.compact
    def __call__(self, x):
        x = Conv3d(self.features, 3, self.stride, 1, name="main")(x)
        return jax.nn.relu(x)


class PREncoder(nn.Module):
    """`Baseline methods/PR++/models.py:132-148`."""

    first_channel: int = 8

    @nn.compact
    def __call__(self, x):
        c = self.first_channel
        out1 = ReluConvBlock(c, name="block1")(x)
        out2 = ReluConvBlock(2 * c, 2, name="block2")(out1)
        out3 = ReluConvBlock(2 * c, 2, name="block3")(out2)
        out4 = ReluConvBlock(4 * c, 2, name="block4")(out3)
        out5 = ReluConvBlock(4 * c, 2, name="block5")(out4)
        return out1, out2, out3, out4, out5


class DecoderBlock(nn.Module):
    """nearest Upsample + skip concat + conv (`PR++/models.py:150-159`)."""

    features: int

    @nn.compact
    def __call__(self, x, skip):
        x = upsample2_nearest(x)
        x = jnp.concatenate([x, skip], axis=-1)
        return ReluConvBlock(self.features, name="Conv")(x)


class BackBone(nn.Module):
    """`Baseline methods/PR++/models.py:161-190`. Features returned
    coarse-to-fine: [4c@1/8, 4c@1/4, 2c@1/2, 2c@full, c@full]."""

    first_channel: int = 8

    @nn.compact
    def __call__(self, x, y):
        c = self.first_channel
        enc = PREncoder(c, name="encoder")
        dec1 = DecoderBlock(4 * c, name="decoder1")
        dec2 = DecoderBlock(4 * c, name="decoder2")
        dec3 = DecoderBlock(2 * c, name="decoder3")
        dec4 = DecoderBlock(2 * c, name="decoder4")
        dec5 = ReluConvBlock(c, name="decoder5")

        def run(v):
            out1, out2, out3, out4, out5 = enc(v)  # full .. 1/16
            # reference naming: feat_1 = deepest (out5) .. feat_5 = full (out1)
            o1 = dec1(out5, out4)
            o2 = dec2(o1, out3)
            o3 = dec3(o2, out2)
            o4 = dec4(o3, out1)
            o5 = dec5(o4)
            return [o1, o2, o3, o4, o5]

        return run(x), run(y)


def correlation3d(mov, fix, kernel_size=3, d=3, sf=2):
    """Windowed correlation (`Baseline methods/PR++/models.py:215-242`):
    per-channel 3^3 box sums of both feature maps (fix padded 2 extra), then
    27 channel-summed products at offsets {-3,-1,1}^3, divided by 27."""
    from smilecode_tpu.losses.core import _box_sum_axis

    def box3(x):
        for axis in (1, 2, 3):
            x = _box_sum_axis(x, kernel_size, axis)
        return x

    pm = box3(mov)
    pf = box3(jnp.pad(fix, ((0, 0), (2, 2), (2, 2), (2, 2), (0, 0))))
    _, dd, hh, ww, _ = mov.shape
    chans = []
    for i in range(d):
        for j in range(d):
            for k in range(d):
                crop = jax.lax.slice(
                    pf,
                    (0, i * sf, j * sf, k * sf, 0),
                    (pf.shape[0], i * sf + dd, j * sf + hh, k * sf + ww, pf.shape[-1]),
                )
                chans.append(jnp.sum(pm * crop, axis=-1, keepdims=True))
    return jnp.concatenate(chans, axis=-1) / (kernel_size ** 3)


class PRBlock(nn.Module):
    """`Baseline methods/PR++/models.py:192-214`."""

    in_flow: bool = True
    scale: bool = True

    @nn.compact
    def __call__(self, x, y, flow=None):
        if self.in_flow:
            if self.scale:
                flow = upsample2_trilinear(flow * 2)
            x = warp(x, flow)
        stack = jnp.concatenate([x, y], axis=-1)
        return Conv3d(
            3, 3, 1, 1,
            kernel_init=normal_init(1e-5), bias_init=nn.initializers.zeros,
            name="flow",
        )(stack)


class PRPlusPlusBlock(nn.Module):
    """`Baseline methods/PR++/models.py:244-282`."""

    in_flow: bool = True
    scale: bool = True

    @nn.compact
    def __call__(self, x, y, flow=None):
        c = x.shape[-1]
        if self.in_flow:
            if self.scale:
                flow = upsample2_trilinear(flow * 2)
            x = warp(x, flow)
        corr = correlation3d(x, y)
        stack = jnp.concatenate([x, corr, y], axis=-1)
        h = Conv3d(2 * c + 27, 3, 1, 1, name="conv1_0")(stack)
        h = Conv3d(c, 3, 1, 1, name="conv1_1")(h)
        h = jax.nn.relu(h)
        res = Conv3d(c, 3, 1, 1, name="conv2_0")(h)
        res = Conv3d(c, 3, 1, 1, name="conv2_1")(res)
        res = jax.nn.relu(res)
        return Conv3d(
            3, 3, 1, 1,
            kernel_init=normal_init(1e-5), bias_init=nn.initializers.zeros,
            name="flow",
        )(h + res)


class PRNet(nn.Module):
    """`Baseline methods/PR++/models.py:284-316`."""

    first_channel: int = 8

    @nn.compact
    def __call__(self, x, y):
        c = self.first_channel
        ox, oy = BackBone(c, name="net")(x, y)
        f1 = PRBlock(in_flow=False, scale=False, name="prblock1")(ox[0], oy[0])
        f2 = PRBlock(name="prblock2")(ox[1], oy[1], f1)
        f3 = PRBlock(name="prblock3")(ox[2], oy[2], f2)
        f4 = PRBlock(name="prblock4")(ox[3], oy[3], f3)
        f5 = PRBlock(scale=False, name="prblock5")(ox[4], oy[4], f4)

        flow = warp(upsample2_trilinear(f1 * 2), f2)
        flow = warp(upsample2_trilinear(flow * 2), f3)
        flow = warp(upsample2_trilinear(flow * 2), f4)
        flow = warp(flow, f5)

        y_moved = warp(x, flow)
        return y_moved, flow


class PRNetPlusPlus(nn.Module):
    """`Baseline methods/PR++/models.py:318-352`."""

    first_channel: int = 8

    @nn.compact
    def __call__(self, x, y):
        c = self.first_channel
        ox, oy = BackBone(c, name="net")(x, y)
        flow = PRPlusPlusBlock(in_flow=False, scale=False, name="prblock1")(ox[0], oy[0])

        w = PRPlusPlusBlock(name="prblock2")(ox[1], oy[1], flow)
        flow = warp(flow, w) + w  # T upsamples the coarse flow implicitly

        w = PRPlusPlusBlock(name="prblock3")(ox[2], oy[2], flow)
        flow = warp(flow, w) + w

        w = PRPlusPlusBlock(name="prblock4")(ox[3], oy[3], flow)
        flow = warp(flow, w) + w

        w = PRPlusPlusBlock(scale=False, name="prblock5")(ox[4], oy[4], flow)
        flow = warp(flow, w) + w

        y_moved = warp(x, flow)
        return y_moved, flow
