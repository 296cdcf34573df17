"""Im2grid — coordinate-translator registration baseline.

Parity: `/root/reference/Baseline methods/Im2Grid/models.py:238-386`.
Same 5-level shared encoder as ModeT (c=4); `PositionalEncodingLayer` is a
zero-init linear projection plus an additive fixed cos/sin 3D positional
encoding scaled by a learned alpha; a single shared `CoTr` module (1-head
ModeT-style neighborhood attention, 27 tokens, NO qk scale, NO rpb) produces
soft coordinate offsets at every level; composition is
``flow = up(2*(T(flow, w) + w))`` at levels 5..2 and ``T(flow,w)+w`` at 1.
"""

from __future__ import annotations

import numpy as np

import jax.numpy as jnp
from flax import linen as nn

from smilecode_tpu.models.modet import Encoder
from smilecode_tpu.ops.attention import neighborhood_attention_3d
from smilecode_tpu.ops.blocks import Dense
from smilecode_tpu.ops.resize import upsample2_trilinear
from smilecode_tpu.ops.warp import warp


def _sincos_pe(d: int, h: int, w: int, channels: int, dim: int) -> np.ndarray:
    """The reference's additive PE: per-axis [cos(pos*pi/(n-1)), sin(...)]
    blocks of `channels` channels each, truncated to `dim`."""
    emb = np.zeros((d, h, w, channels * 3), np.float32)

    def axis_emb(n):
        pos = np.arange(n, dtype=np.float32) * (np.pi / (n - 1))
        return np.stack([np.cos(pos), np.sin(pos)], -1)  # (n, 2)

    ex = axis_emb(d)  # varies along axis 0
    ey = axis_emb(h)
    ez = axis_emb(w)
    # reference zero-fills then assigns; only the first 2 channels of each
    # block are written (channels == 2 for dim=6)
    emb[..., 0:2] = ex[:, None, None, :]
    emb[..., channels:channels + 2] = ey[None, :, None, :]
    emb[..., 2 * channels:2 * channels + 2] = ez[None, None, :, :]
    return emb[..., :dim]


class PositionalEncodingLayer(nn.Module):
    """Zero-init proj + alpha-scaled fixed PE
    (`Baseline methods/Im2Grid/models.py:238-274`)."""

    dim: int = 6

    @nn.compact
    def __call__(self, feat):
        proj = Dense(
            self.dim,
            kernel_init=nn.initializers.zeros,
            bias_init=nn.initializers.zeros,
            name="proj",
        )
        alpha = self.param("alpha", nn.initializers.ones, (1,))
        feat = proj(feat)
        _, d, h, w, _ = feat.shape
        channels = int(np.ceil(self.dim / 6) * 2)
        if channels % 2:
            channels += 1
        emb = jnp.asarray(_sincos_pe(d, h, w, channels, self.dim), feat.dtype)
        return feat + alpha.astype(feat.dtype) * emb


def cotr(q, k):
    """Shared single-head neighborhood attention, no scale, no rpb
    (`Baseline methods/Im2Grid/models.py:276-322`). Parameter-free."""
    b, d, h, w, c = q.shape
    out = neighborhood_attention_3d(
        q.reshape(b, d, h, w, 1, c), k.reshape(b, d, h, w, 1, c), None, scale=1.0
    )
    return out  # (B, D, H, W, 3)


class Im2grid(nn.Module):
    """`Baseline methods/Im2Grid/models.py:325-386`."""

    channels: int = 4

    @nn.compact
    def __call__(self, moving, fixed):
        c = self.channels
        encoder = Encoder(first_out_channel=c, name="encoder")
        m1, m2, m3, m4, m5 = encoder(moving)
        f1, f2, f3, f4, f5 = encoder(fixed)

        pe5 = PositionalEncodingLayer(name="peblock5")
        w = cotr(pe5(f5), pe5(m5))
        flow = upsample2_trilinear(2 * w)

        m4 = warp(m4, flow)
        pe4 = PositionalEncodingLayer(name="peblock4")
        w = cotr(pe4(f4), pe4(m4))
        flow = upsample2_trilinear(2 * (warp(flow, w) + w))

        m3 = warp(m3, flow)
        pe3 = PositionalEncodingLayer(name="peblock3")
        w = cotr(pe3(f3), pe3(m3))
        flow = upsample2_trilinear(2 * (warp(flow, w) + w))

        m2 = warp(m2, flow)
        pe2 = PositionalEncodingLayer(name="peblock2")
        w = cotr(pe2(f2), pe2(m2))
        flow = upsample2_trilinear(2 * (warp(flow, w) + w))

        m1 = warp(m1, flow)
        pe1 = PositionalEncodingLayer(name="peblock1")
        w = cotr(pe1(f1), pe1(m1))
        flow = warp(flow, w) + w

        y_moved = warp(moving, flow)
        return y_moved, flow
