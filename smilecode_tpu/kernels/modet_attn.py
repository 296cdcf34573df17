"""Fused Pallas TPU kernel: neighborhood attention -> deformation subfields.

This is the TPU-native equivalent of the reference's CUDA operator
(`/root/reference/ModeT-cu/modet/modet_kernel.cu:17-154` fuses QK+RPB only;
softmax and the offset contraction stay in torch,
`/root/reference/ModeT-cu/models.py:312-313`). Here the WHOLE chain is fused —
window-gather + QK·scale + RPB + softmax(27) + contraction with the constant
(-1,0,1)^3 offset grid — so the (B,heads,D,H,W,27) attention tensor (the
reference's "memory boom", `/root/reference/ModeT/models.py:322`) never
touches HBM.

Design (one program per (batch*head, d-slab, h-block)):
  * q laid out (BH, D, hd, H, Wp) — W in lanes (padded to a 128 multiple for
    Mosaic DMA alignment), H in sublanes, split into h-blocks to fit VMEM;
  * k pre-padded once in XLA (zero borders = reference's `nnf.pad`) and kept
    in HBM; each program DMAs its (3, hd, hb+2, Wpk) window into VMEM;
  * 27 logit slabs (hb, w) accumulate over head_dim with shifted static
    slices of the k window (no gather, pure VPU);
  * streaming softmax over the 27 slabs; the offset contraction is just
    +-adds (offsets are in {-1, 0, 1});
  * rpb sits in SMEM as (heads, 27), read per program.

Backward: custom VJP whose bwd currently recomputes through the XLA oracle
(correct; a fused backward kernel mirroring modet_kernel.cu's dq/dk/drpb is
the planned optimization).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

_OFFSETS = [(od, oh, ow) for od in range(3) for oh in range(3) for ow in range(3)]


def _round_up(x: int, m: int) -> int:
    return (x + m - 1) // m * m


def _pick_h_block(hp: int) -> int:
    """hp is a multiple of 8; pick a block size that divides it."""
    for cand in (64, 56, 48, 40, 32, 24, 16, 8):
        if hp % cand == 0:
            return cand
    return hp


def _attn_kernel(hd: int, heads: int, wp: int, hb: int,
                 rpb_ref, q_ref, k_hbm, o_ref, ksc, lsc, sem):
    bh = pl.program_id(0)
    d = pl.program_id(1)
    hblk = pl.program_id(2)
    head = bh % heads

    copy = pltpu.make_async_copy(
        k_hbm.at[bh, pl.ds(d, 3), :, pl.ds(hblk * hb, hb + 8)], ksc, sem
    )
    copy.start()
    copy.wait()

    # 27 logit slabs + running max; full wp lanes (pad lanes hold garbage
    # that is sliced away after the pallas_call)
    m = None
    for t, (od, oh, ow) in enumerate(_OFFSETS):
        acc = q_ref[0, 0, 0] * ksc[od, 0, oh:oh + hb, ow:ow + wp]
        for c in range(1, hd):
            acc += q_ref[0, 0, c] * ksc[od, c, oh:oh + hb, ow:ow + wp]
        acc += rpb_ref[head, t]
        lsc[t] = acc
        m = acc if m is None else jnp.maximum(m, acc)

    # streaming softmax + offset contraction (offsets in {-1,0,1})
    s = jnp.zeros((hb, wp), jnp.float32)
    a0 = jnp.zeros((hb, wp), jnp.float32)
    a1 = jnp.zeros((hb, wp), jnp.float32)
    a2 = jnp.zeros((hb, wp), jnp.float32)
    for t, (od, oh, ow) in enumerate(_OFFSETS):
        e = jnp.exp(lsc[t] - m)
        s += e
        if od == 0:
            a0 -= e
        elif od == 2:
            a0 += e
        if oh == 0:
            a1 -= e
        elif oh == 2:
            a1 += e
        if ow == 0:
            a2 -= e
        elif ow == 2:
            a2 += e
    inv = 1.0 / s
    o_ref[0, 0, 0] = a0 * inv
    o_ref[0, 0, 1] = a1 * inv
    o_ref[0, 0, 2] = a2 * inv


def _forward(q, k, rpb, scale, interpret=False):
    b, d, h, w, heads, hd = q.shape
    bh = b * heads
    dt = jnp.float32
    wp = _round_up(w, 128)
    wpk = wp + 128  # k window is read at lane offsets 0..2 over wp lanes
    hp = _round_up(h, 8)  # sublane alignment for DMA extents
    hb = _pick_h_block(hp)

    qs = (q.astype(dt) * dt(scale)).transpose(0, 4, 1, 5, 2, 3).reshape(bh, d, hd, h, w)
    qs = jnp.pad(qs, ((0, 0),) * 3 + ((0, hp - h), (0, wp - w)))
    # zero borders (reference pad) + alignment padding: H to hp+8 sublanes,
    # W lanes to a 128 multiple
    kp = jnp.pad(
        k.astype(dt).transpose(0, 4, 1, 5, 2, 3).reshape(bh, d, hd, h, w),
        ((0, 0), (1, 1), (0, 0), (1, hp + 7 - h), (1, wpk - w - 1)),
    )

    if rpb is None:
        rpb_flat = jnp.zeros((heads, 27), dt)
    else:
        rpb_flat = rpb.astype(dt).reshape(heads, 27)

    kernel = functools.partial(_attn_kernel, hd, heads, wp, hb)
    out = pl.pallas_call(
        kernel,
        grid=(bh, d, hp // hb),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.SMEM),  # rpb (heads, 27)
            pl.BlockSpec((1, 1, hd, hb, wp), lambda i, j, hblk: (i, j, 0, hblk, 0),
                         memory_space=pltpu.VMEM),  # q slab
            pl.BlockSpec(memory_space=pltpu.ANY),  # k stays in HBM
        ],
        out_specs=pl.BlockSpec((1, 1, 3, hb, wp), lambda i, j, hblk: (i, j, 0, hblk, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((bh, d, 3, hp, wp), dt),
        scratch_shapes=[
            pltpu.VMEM((3, hd, hb + 8, wpk), dt),  # k window
            pltpu.VMEM((27, hb, wp), dt),  # logits
            pltpu.SemaphoreType.DMA(()),
        ],
        interpret=interpret,
    )(rpb_flat, qs, kp)

    out = out[..., :h, :w].reshape(b, heads, d, 3, h, w).transpose(0, 2, 4, 5, 1, 3)
    return out.reshape(b, d, h, w, heads * 3).astype(q.dtype)


@functools.partial(jax.custom_vjp, nondiff_argnums=(3, 4))
def modet_attention_pallas(q, k, rpb, scale: float = 1.0, interpret: bool = False):
    """Fused neighborhood attention; same contract as the XLA oracle
    (`smilecode_tpu.ops.attention._neighborhood_attention_xla`).

    q, k: (B, D, H, W, heads, head_dim); rpb: (heads, 3, 3, 3) or zeros.
    Returns (B, D, H, W, heads*3).
    """
    return _forward(q, k, rpb, scale, interpret)


def _fwd(q, k, rpb, scale, interpret):
    out = _forward(q, k, rpb, scale, interpret)
    return out, (q, k, rpb)


def _bwd(scale, interpret, res, g):
    from smilecode_tpu.ops.attention import _neighborhood_attention_xla

    q, k, rpb = res
    if rpb is None:
        _, vjp = jax.vjp(lambda q_, k_: _neighborhood_attention_xla(q_, k_, None, scale), q, k)
        dq, dk = vjp(g)
        return dq, dk, None
    _, vjp = jax.vjp(
        lambda q_, k_, r_: _neighborhood_attention_xla(q_, k_, r_, scale), q, k, rpb
    )
    return vjp(g)


modet_attention_pallas.defvjp(_fwd, _bwd)
