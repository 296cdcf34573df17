"""RDN family — doubly-recursive registration networks (6 reference variants).

Parity: `/root/reference/Baseline methods/RDN/models.py:172-978`.
4-level stride-2 conv encoder (c=16, LeakyReLU); `Estimator` = 3 convs +
LReLU + N(0,1e-5) flow conv; outer stage recursion re-warps the float
encoder features by the accumulated flow (downscaled per level via
``interpolate(flow, scale)*scale``); inner level recursion repeats
estimate -> compose per pyramid level (coarse 1/16 up to 1/2); all flows at
half resolution, final 2x trilinear upsample.

Variants map to flags (the reference's 6 classes RDN / RDN_share /
RDN_diff / RDN_diff_share and their *_test twins):
  share_weights: one Estimator set shared across stages vs one per stage;
  diff: each increment is integrated (VecInt) before composing (the
    diffeomorphic variant), and the model additionally returns the
    stationary-velocity compositions `sv` per stage;
  return_aux: emit the per-stage flows (training) or just (moved, flow).
"""

from __future__ import annotations

from typing import Sequence

import jax.numpy as jnp
from flax import linen as nn

from smilecode_tpu.ops.blocks import Conv3d, ConvBlock, leaky_relu, normal_init
from smilecode_tpu.ops.integrate import vecint
from smilecode_tpu.ops.resize import interp_trilinear, upsample2_trilinear
from smilecode_tpu.ops.warp import warp


class RDNEncoder(nn.Module):
    """`Baseline methods/RDN/models.py:172-192`. NB: RDN's ConvBlock defaults
    to LeakyReLU alpha=0.2 (`RDN/models.py:125`), unlike the 0.1 used
    everywhere else in the reference."""

    first_out_channel: int = 16

    @nn.compact
    def __call__(self, x):
        c = self.first_out_channel
        out0 = ConvBlock(c, 3, 2, 1, alpha=0.2, name="conv0")(x)
        out1 = ConvBlock(2 * c, 3, 2, 1, alpha=0.2, name="conv1")(out0)
        out2 = ConvBlock(4 * c, 3, 2, 1, alpha=0.2, name="conv2")(out1)
        out3 = ConvBlock(8 * c, 3, 2, 1, alpha=0.2, name="conv3")(out2)
        return out0, out1, out2, out3


class Estimator(nn.Module):
    """`Baseline methods/RDN/models.py:195-214`.

    dropout_rate > 0 enables an MC-dropout head (after the activation,
    before the flow conv) for the uncertainty protocol of
    `RDN/utils.py:377-504`; stochastic only when the caller supplies a
    "dropout" rng (``model.apply(params, m, f, rngs={"dropout": key})``).
    The reference models.py ships no dropout layer itself — its utils
    expect an externally dropout-enabled net — so the placement here is
    our design choice, documented for the parity record.
    """

    dropout_rate: float = 0.0

    @nn.compact
    def __call__(self, fixed_fm, float_fm):
        x = jnp.concatenate([fixed_fm, float_fm], axis=-1)
        c = x.shape[-1]
        x = Conv3d(c, 3, 1, 1, name="conv_0")(x)
        x = Conv3d(c, 3, 1, 1, name="conv_1")(x)
        x = Conv3d(c, 3, 1, 1, name="conv_2")(x)
        x = leaky_relu(x, 0.1)
        if self.dropout_rate > 0:
            x = nn.Dropout(self.dropout_rate)(
                x, deterministic=not self.has_rng("dropout")
            )
        return Conv3d(
            3, 3, 1, 1,
            kernel_init=normal_init(1e-5), bias_init=nn.initializers.zeros,
            name="conv_4",
        )(x)


def _scaled_downsample(flow, factor: float):
    """reference: ``interpolate(flow, scale_factor=f) * f`` (align_corners)."""
    _, d, h, w, _ = flow.shape
    out = interp_trilinear(flow, (int(d * factor), int(h * factor), int(w * factor)))
    return out * factor


class RDN(nn.Module):
    """All 6 reference variants via flags (see module docstring)."""

    channels: int = 16
    stages: int = 1
    levels: Sequence[int] = (1, 1, 1, 1)
    share_weights: bool = True
    diff: bool = False
    return_aux: bool = True
    # MC-dropout rate for the uncertainty protocol (0 = off; see Estimator)
    dropout_rate: float = 0.0

    @nn.compact
    def __call__(self, moving, fixed):
        c = self.channels
        enc = RDNEncoder(c, name="encoder")
        f0m, f1m, f2m, f3m = enc(moving)
        f0f, f1f, f2f, f3f = enc(fixed)

        ests = {}

        def est(level: int, stage: int) -> Estimator:
            key = (level, 0 if self.share_weights else stage)
            if key not in ests:
                name = f"est{level}" if self.share_weights else f"est{level}_{stage}"
                ests[key] = Estimator(dropout_rate=self.dropout_rate, name=name)
            return ests[key]

        flow = None
        aux = []
        for i in range(self.stages):
            if i == 0:
                fm0, fm1, fm2, fm3 = f0m, f1m, f2m, f3m
            else:
                fm3 = warp(f3m, _scaled_downsample(flow, 0.125))
                fm2 = warp(f2m, _scaled_downsample(flow, 0.25))
                fm1 = warp(f1m, _scaled_downsample(flow, 0.5))
                fm0 = warp(f0m, flow)

            sflow = None
            sv = None
            # level 4 (1/16)
            for j in range(self.levels[3]):
                if j == 0:
                    w = est(3, i)(f3f, fm3)
                    if self.diff:
                        sv = w
                        sflow = vecint(w, 7)
                    else:
                        sflow = w
                else:
                    w = est(3, i)(f3f, warp(fm3, sflow))
                    if self.diff:
                        sv = warp(sv, w) + w
                        w = vecint(w, 7)
                    sflow = warp(sflow, w) + w

            # levels 3..1 (1/8, 1/4, 1/2)
            for lvl, (ff, fm) in zip((2, 1, 0), ((f2f, fm2), (f1f, fm1), (f0f, fm0))):
                sflow = upsample2_trilinear(2 * sflow)
                if self.diff:
                    sv = upsample2_trilinear(2 * sv)
                for j in range(self.levels[lvl]):
                    w = est(lvl, i)(ff, warp(fm, sflow))
                    if self.diff:
                        sv = warp(sv, w) + w
                        w = vecint(w, 7)
                    sflow = warp(sflow, w) + w

            flow = sflow if i == 0 else warp(flow, sflow) + sflow
            aux.append(sv if self.diff else sflow)

        flow_out = upsample2_trilinear(2 * flow)
        y_moved = warp(moving, flow_out)
        if self.return_aux:
            return (y_moved, flow_out, *aux)
        return y_moved, flow_out
