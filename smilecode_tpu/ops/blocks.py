"""Shared conv building blocks (flax.linen, channels-last NDHWC).

Parity targets in the reference (`/root/reference/ModeT/models.py:119-179`):
ConvBlock (Conv3d + LeakyReLU(0.1)), ConvInsBlock (+InstanceNorm3d),
UpConvBlock (ConvTranspose3d(k=4, s=2) then crop [1:-1] per axis + IN + LReLU),
DeconvBlock (UpConv + skip concat + 2x ConvInsBlock).

Initializers reproduce torch defaults (kaiming_uniform(a=sqrt(5)) ==
U(-1/sqrt(fan_in), 1/sqrt(fan_in)) for both weight and bias) so training
dynamics match the reference.
"""

from __future__ import annotations

from typing import Sequence

import jax
import jax.numpy as jnp
from flax import linen as nn


def torch_uniform_init(fan_in: int):
    """U(-1/sqrt(fan_in), 1/sqrt(fan_in)) — torch Conv/Linear default."""
    bound = 1.0 / (fan_in ** 0.5)

    def init(key, shape, dtype=jnp.float32):
        return jax.random.uniform(key, shape, dtype, -bound, bound)

    return init


def normal_init(stddev: float):
    def init(key, shape, dtype=jnp.float32):
        return jax.random.normal(key, shape, dtype) * stddev

    return init


def instance_norm(x: jax.Array, eps: float = 1e-5) -> jax.Array:
    """torch InstanceNorm3d (affine=False, biased var) on (B, D, H, W, C)."""
    mean = jnp.mean(x, axis=(1, 2, 3), keepdims=True)
    var = jnp.var(x, axis=(1, 2, 3), keepdims=True)
    return (x - mean) * jax.lax.rsqrt(var + eps)


def leaky_relu(x: jax.Array, alpha: float = 0.1) -> jax.Array:
    return jnp.where(x >= 0, x, alpha * x)


# conv implementation policy. "s2d" (space-to-depth, ops/conv_s2d.py) looked
# promising on paper but measured 2.4x SLOWER than direct at LPBA shapes on
# v5e (8.3 vs 20.4 ms for 4->8 at 160x192x160) — the PER-CONV reshuffles
# cost more than the MXU lane-utilization gain. Round 2 resolved this: the
# s2d idea wins when the volume STAYS in s2d layout across the whole conv
# chain (`ops/encoder_s2d.py`, encoder 67.5 -> 15.1 ms; used by the planes
# fast path). "auto" here still means direct — per-op dispatch can't
# amortize the shuffles.
CONV_IMPL = "auto"


def _use_s2d(x, k, stride, padding, cin) -> bool:
    if CONV_IMPL == "direct":
        return False
    if k != 3 or stride != 1 or padding != 1 or cin > 16:
        return False
    if any(s % 2 for s in x.shape[1:4]):
        return False
    if CONV_IMPL == "s2d":
        return True
    return False  # "auto" currently means direct (see note above)


class Conv3d(nn.Module):
    """3D conv on NDHWC with torch-default init and explicit padding."""

    features: int
    kernel_size: int = 3
    stride: int = 1
    padding: int = 1
    use_bias: bool = True
    kernel_init: nn.initializers.Initializer | None = None
    bias_init: nn.initializers.Initializer | None = None

    @nn.compact
    def __call__(self, x):
        in_ch = x.shape[-1]
        k = self.kernel_size
        fan_in = in_ch * k ** 3
        kinit = self.kernel_init or torch_uniform_init(fan_in)
        kernel = self.param("kernel", kinit, (k, k, k, in_ch, self.features))
        bias = None
        if self.use_bias:
            binit = self.bias_init or torch_uniform_init(fan_in)
            bias = self.param("bias", binit, (self.features,))
        if _use_s2d(x, k, self.stride, self.padding, in_ch):
            from smilecode_tpu.ops.conv_s2d import conv3d_s2d

            return conv3d_s2d(x, kernel, bias)
        y = jax.lax.conv_general_dilated(
            x,
            kernel.astype(x.dtype),
            window_strides=(self.stride,) * 3,
            padding=[(self.padding, self.padding)] * 3,
            dimension_numbers=("NDHWC", "DHWIO", "NDHWC"),
        )
        if bias is not None:
            y = y + bias.astype(y.dtype)
        return y


class ConvTranspose3d(nn.Module):
    """torch ConvTranspose3d(kernel, stride, padding=0) parity on NDHWC.

    Kernel param layout (k, k, k, Cin, Cout); equals torch weight
    (Cin, Cout, k, k, k) transposed (2,3,4,0,1). Computed as an
    lhs-dilated conv with the spatially flipped kernel — exactly the
    transpose of a strided conv, which is torch's definition.
    """

    features: int
    kernel_size: int = 4
    stride: int = 2

    @nn.compact
    def __call__(self, x):
        in_ch = x.shape[-1]
        k = self.kernel_size
        # torch ConvTranspose default init uses fan_in = Cout * k^3 / groups?
        # torch uses weight.size(1) * prod(kernel) = Cout * k^3 for transpose.
        fan_in = self.features * k ** 3
        kernel = self.param(
            "kernel", torch_uniform_init(fan_in), (k, k, k, in_ch, self.features)
        )
        bias = self.param("bias", torch_uniform_init(fan_in), (self.features,))
        y = jax.lax.conv_general_dilated(
            x,
            jnp.flip(kernel, (0, 1, 2)).astype(x.dtype),
            window_strides=(1, 1, 1),
            padding=[(k - 1, k - 1)] * 3,
            lhs_dilation=(self.stride,) * 3,
            dimension_numbers=("NDHWC", "DHWIO", "NDHWC"),
        )
        return y + bias.astype(y.dtype)


class ConvBlock(nn.Module):
    """Conv3d + LeakyReLU(alpha) (`ModeT/models.py:119-133`)."""

    features: int
    kernel_size: int = 3
    stride: int = 1
    padding: int = 1
    alpha: float = 0.1

    @nn.compact
    def __call__(self, x):
        x = Conv3d(self.features, self.kernel_size, self.stride, self.padding, name="main")(x)
        return leaky_relu(x, self.alpha)


class ConvInsBlock(nn.Module):
    """Conv3d + InstanceNorm3d + LeakyReLU(alpha) (`ModeT/models.py:135-151`)."""

    features: int
    kernel_size: int = 3
    stride: int = 1
    padding: int = 1
    alpha: float = 0.1

    @nn.compact
    def __call__(self, x):
        x = Conv3d(self.features, self.kernel_size, self.stride, self.padding, name="main")(x)
        return leaky_relu(instance_norm(x), self.alpha)


class UpConvBlock(nn.Module):
    """ConvTranspose3d(k=4, s=2), crop 1 voxel per border, IN, LReLU.

    (`ModeT/models.py:153-166`) — output is exactly 2x the input size.
    """

    features: int
    kernel_size: int = 4
    stride: int = 2
    alpha: float = 0.1

    @nn.compact
    def __call__(self, x):
        x = ConvTranspose3d(self.features, self.kernel_size, self.stride, name="upconv")(x)
        x = x[:, 1:-1, 1:-1, 1:-1, :]
        return leaky_relu(instance_norm(x), self.alpha)


class DeconvBlock(nn.Module):
    """UpConv then concat skip then two ConvInsBlocks (`ModeT/models.py:168-179`)."""

    skip_features: int

    @nn.compact
    def __call__(self, dec, skip):
        dec = UpConvBlock(self.skip_features, name="upconv")(dec)
        out = jnp.concatenate([dec, skip], axis=-1)
        out = ConvInsBlock(self.skip_features, name="conv_0")(out)
        out = ConvInsBlock(self.skip_features, name="conv_1")(out)
        return out


class Dense(nn.Module):
    """Linear layer with torch-default init; kernel (in, out)."""

    features: int
    kernel_init: nn.initializers.Initializer | None = None
    bias_init: nn.initializers.Initializer | None = None

    @nn.compact
    def __call__(self, x):
        in_ch = x.shape[-1]
        kinit = self.kernel_init or torch_uniform_init(in_ch)
        binit = self.bias_init or torch_uniform_init(in_ch)
        kernel = self.param("kernel", kinit, (in_ch, self.features))
        bias = self.param("bias", binit, (self.features,))
        return x @ kernel.astype(x.dtype) + bias.astype(x.dtype)


class LayerNorm(nn.Module):
    """torch LayerNorm over the last axis (eps 1e-5, affine)."""

    epsilon: float = 1e-5

    @nn.compact
    def __call__(self, x):
        dim = x.shape[-1]
        scale = self.param("scale", nn.initializers.ones, (dim,))
        bias = self.param("bias", nn.initializers.zeros, (dim,))
        mean = jnp.mean(x, axis=-1, keepdims=True)
        var = jnp.var(x, axis=-1, keepdims=True)
        y = (x - mean) * jax.lax.rsqrt(var + self.epsilon)
        return y * scale.astype(x.dtype) + bias.astype(x.dtype)
