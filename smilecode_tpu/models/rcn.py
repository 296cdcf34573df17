"""VTN and RCN (recursive cascaded networks) baselines.

Parity: `/root/reference/Baseline methods/RCN/models.py:164-356`.
VTN is a VoxelMorph-style net: concat(moving, fixed) 2-channel input, 6-level
strided-conv encoder (c=16..32c, ReLU-free LeakyReLU convs), FlowNet-style
decoder predicting a flow at each level plus upsampled-flow skip; final
`Pred0` transposed-conv flow head with N(0,1e-5) weights (bias-free).
RCN stacks n_cascade=10 VTNs recursively: ``flow = w + T(flow, w)``,
re-warping the ORIGINAL moving image each iteration; training returns
``(moved, flow, *subflows)`` (the `RCN_test` variant = return_aux=False).
"""

from __future__ import annotations

import jax.numpy as jnp
from flax import linen as nn

from smilecode_tpu.ops.blocks import Conv3d, ConvBlock, ConvTranspose3d, leaky_relu, normal_init
from smilecode_tpu.ops.warp import warp


class UpConvFlow(nn.Module):
    """ConvTranspose3d(k4, s2, bias=False) + crop; optional N(0,1e-5) init
    (`Baseline methods/RCN/models.py:137-147`)."""

    features: int
    final: bool = False

    @nn.compact
    def __call__(self, x):
        in_ch = x.shape[-1]
        k = 4
        fan_in = self.features * k ** 3
        from smilecode_tpu.ops.blocks import torch_uniform_init

        init = normal_init(1e-5) if self.final else torch_uniform_init(fan_in)
        kernel = self.param("kernel", init, (k, k, k, in_ch, self.features))
        import jax

        y = jax.lax.conv_general_dilated(
            x,
            jnp.flip(kernel, (0, 1, 2)).astype(x.dtype),
            window_strides=(1, 1, 1),
            padding=[(3, 3)] * 3,
            lhs_dilation=(2, 2, 2),
            dimension_numbers=("NDHWC", "DHWIO", "NDHWC"),
        )
        return y[:, 1:-1, 1:-1, 1:-1, :]


class UpConvLeakyReLU(nn.Module):
    """ConvTranspose3d(k4, s2) + crop + LeakyReLU
    (`Baseline methods/RCN/models.py:149-160`)."""

    features: int

    @nn.compact
    def __call__(self, x):
        x = ConvTranspose3d(self.features, 4, 2, name="upconv")(x)
        x = x[:, 1:-1, 1:-1, 1:-1, :]
        return leaky_relu(x, 0.1)


class VTNEncoder(nn.Module):
    """6 stride-2 levels (`Baseline methods/RCN/models.py:164-205`)."""

    first_out_channel: int = 16

    @nn.compact
    def __call__(self, x):
        c = self.first_out_channel
        out1 = ConvBlock(c, 3, 2, 1, name="conv1")(x)
        out2 = ConvBlock(2 * c, 3, 2, 1, name="conv2")(out1)
        out3 = ConvBlock(4 * c, 3, 2, 1, name="conv3_0")(out2)
        out3 = ConvBlock(4 * c, 3, 1, 1, name="conv3_1")(out3)
        out4 = ConvBlock(8 * c, 3, 2, 1, name="conv4_0")(out3)
        out4 = ConvBlock(8 * c, 3, 1, 1, name="conv4_1")(out4)
        out5 = ConvBlock(16 * c, 3, 2, 1, name="conv5_0")(out4)
        out5 = ConvBlock(16 * c, 3, 1, 1, name="conv5_1")(out5)
        out6 = ConvBlock(32 * c, 3, 2, 1, name="conv6_0")(out5)
        out6 = ConvBlock(32 * c, 3, 1, 1, name="conv6_1")(out6)
        return out1, out2, out3, out4, out5, out6


class VTN(nn.Module):
    """`Baseline methods/RCN/models.py:210-302`."""

    channels: int = 16
    flow_multiplier: float = 1.0
    do_warp: bool = True

    @nn.compact
    def __call__(self, moving, fixed):
        c = self.channels
        x = jnp.concatenate([moving, fixed], axis=-1)
        conv1, conv2, conv3, conv4, conv5, conv6 = VTNEncoder(c, name="encoder")(x)

        w = Conv3d(3, 3, 1, 1, name="Pred6")(conv6)
        w = UpConvFlow(3, name="Upsamp6to5")(w)
        deconv5 = UpConvLeakyReLU(16 * c, name="Deconv5")(conv6)
        concat5 = jnp.concatenate([conv5, deconv5, w], axis=-1)

        w = Conv3d(3, 3, 1, 1, name="Pred5")(concat5)
        w = UpConvFlow(3, name="Upsamp5to4")(w)
        deconv4 = UpConvLeakyReLU(8 * c, name="Deconv4")(concat5)
        concat4 = jnp.concatenate([conv4, deconv4, w], axis=-1)

        w = Conv3d(3, 3, 1, 1, name="Pred4")(concat4)
        w = UpConvFlow(3, name="Upsamp4to3")(w)
        deconv3 = UpConvLeakyReLU(4 * c, name="Deconv3")(concat4)
        concat3 = jnp.concatenate([conv3, deconv3, w], axis=-1)

        w = Conv3d(3, 3, 1, 1, name="Pred3")(concat3)
        w = UpConvFlow(3, name="Upsamp3to2")(w)
        deconv2 = UpConvLeakyReLU(2 * c, name="Deconv2")(concat3)
        concat2 = jnp.concatenate([conv2, deconv2, w], axis=-1)

        w = Conv3d(3, 3, 1, 1, name="Pred2")(concat2)
        w = UpConvFlow(3, name="Upsamp2to1")(w)
        deconv1 = UpConvLeakyReLU(c, name="Deconv1")(concat2)
        concat1 = jnp.concatenate([conv1, deconv1, w], axis=-1)

        flow = UpConvFlow(3, final=True, name="Pred0")(concat1)
        flow = flow * self.flow_multiplier

        if self.do_warp:
            return warp(moving, flow), flow
        return flow


class RCN(nn.Module):
    """Recursive cascade of VTNs (`Baseline methods/RCN/models.py:304-356`).

    return_aux=True mirrors RCN (train); False mirrors RCN_test.
    """

    n_cascade: int = 10
    channels: int = 16
    flow_multiplier: float = 1.0
    return_aux: bool = True

    @nn.compact
    def __call__(self, moving, fixed):
        flow = None
        subflows = []
        moved = moving
        for i in range(self.n_cascade):
            w = VTN(
                self.channels, self.flow_multiplier, do_warp=False, name=f"vtn_{i}"
            )(moved, fixed)
            subflows.append(w)
            flow = w if i == 0 else w + warp(flow, w)
            moved = warp(moving, flow)
        if self.return_aux:
            return (moved, flow, *subflows)
        return moved, flow
