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

Backward: custom VJP with FUSED Pallas backward kernels mirroring the
reference's dq/dk/drpb math (`modet_kernel.cu:156-381`): B1 recomputes the
27-wide softmax from (q, k), forms d_logits, and fuses dq + per-program drpb
partials; B2 runs the inverse-window recurrence for dk (see `_bwd_kernel_b1`
/ `_bwd_kernel_b2` below). Grads match the oracle autodiff to ~2e-6 on
hardware (tests/test_pallas_attn.py).
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


def _pick_h_block(hp: int, maxb: int = 64) -> int:
    """hp is a multiple of 8; pick a block size that divides it."""
    for cand in (64, 56, 48, 40, 32, 24, 16, 8):
        if cand <= maxb and hp % cand == 0:
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
    # that is sliced away after the pallas_call). q/k may be stored bf16
    # (halves the HBM-side buffers); logits always accumulate f32.
    f32 = jnp.float32
    m = None
    for t, (od, oh, ow) in enumerate(_OFFSETS):
        acc = q_ref[0, 0, 0].astype(f32) * ksc[od, 0, oh:oh + hb, ow:ow + wp].astype(f32)
        for c in range(1, hd):
            acc += q_ref[0, 0, c].astype(f32) * ksc[od, c, oh:oh + hb, ow:ow + wp].astype(f32)
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
    # out block is (1, 3, 1, hb, wp): component axis at dim 1
    o_ref[0, 0, 0] = a0 * inv
    o_ref[0, 1, 0] = a1 * inv
    o_ref[0, 2, 0] = a2 * inv


def modet_attention_planes(qs, kplanes, rpb, heads: int, scale: float = 1.0,
                           interpret: bool = False, k_prepadded_d: bool = False):
    """Planes-layout entry (no pre/post relayout): qs/kplanes are
    (B*heads, D, head_dim, H, W) with W minor; output is
    (B*heads, 3, D, H, W). Used by the planes-layout ModeT forward
    (`models/modet_planes.py`) where the whole decoder stays W-minor.
    Forward-only (no custom VJP) — training uses the NDHWC entry below.

    ``k_prepadded_d``: kplanes already carries its 1-voxel D border (shape
    D+2 along axis 1) — used by the D-sharded planes path, where the border
    comes from a neighbor-shard halo exchange instead of zero padding
    (`parallel/modet_planes_sp.py`).
    """
    bh, d, hd, h, w = qs.shape
    dt = jnp.float32
    # bf16 inputs keep their dtype on the HBM side (halves the padded q/k
    # buffers — the biggest planes-path allocations); compute stays f32
    io_dt = qs.dtype if qs.dtype == jnp.bfloat16 else dt
    wp = _round_up(w, 128)
    wpk = wp + 128
    hp = _round_up(h, 8)
    hb = _pick_h_block(hp)

    qs = (qs * qs.dtype.type(scale)).astype(io_dt)
    qs = jnp.pad(qs, ((0, 0),) * 3 + ((0, hp - h), (0, wp - w)))
    d_pad = (0, 0) if k_prepadded_d else (1, 1)
    kp = jnp.pad(
        kplanes.astype(io_dt),
        ((0, 0), d_pad, (0, 0), (1, hp + 7 - h), (1, wpk - w - 1)),
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
        # output laid out (BH, 3, D, H, W): the subfield-component axis sits
        # OUTSIDE the spatial block so downstream planes consumers read it
        # without a relayout
        out_specs=pl.BlockSpec((1, 3, 1, hb, wp), lambda i, j, hblk: (i, 0, j, hblk, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((bh, 3, d, hp, wp), dt),
        scratch_shapes=[
            pltpu.VMEM((3, hd, hb + 8, wpk), io_dt),  # k window
            pltpu.VMEM((27, hb, wp), dt),  # logits
            pltpu.SemaphoreType.DMA(()),
        ],
        interpret=interpret,
    )(rpb_flat, qs, kp)
    return out[..., :h, :w]


def _forward(q, k, rpb, scale, interpret=False):
    b, d, h, w, heads, hd = q.shape
    bh = b * heads

    qs = q.transpose(0, 4, 1, 5, 2, 3).reshape(bh, d, hd, h, w)
    kpl = k.transpose(0, 4, 1, 5, 2, 3).reshape(bh, d, hd, h, w)
    out = modet_attention_planes(qs, kpl, rpb, heads, scale, interpret)
    # (bh, 3, d, h, w) -> (b, d, h, w, heads*3)
    out = out.reshape(b, heads, 3, d, h, w).transpose(0, 3, 4, 5, 1, 2)
    return out.reshape(b, d, h, w, heads * 3).astype(q.dtype)


def _bwd1_kernel(hd: int, heads: int, wp: int, hb: int, h: int, w: int, scale: float,
                 rpb_ref, q_ref, g_ref, k_hbm, dq_ref, dl_ref, drpb_ref, ksc, lsc, sem):
    """Per (bh, d, hblk): recompute softmax probs (like the forward), turn the
    output gradient into d_logits, fuse dq (k window is already in VMEM) and
    the block's drpb partial sums. Mirrors the reference's dq kernel
    (`modet_kernel.cu:156-207`) + the softmax/offset-contraction backward the
    reference leaves to torch autograd."""
    bh = pl.program_id(0)
    d = pl.program_id(1)
    hblk = pl.program_id(2)
    head = bh % heads
    f32 = jnp.float32

    copy = pltpu.make_async_copy(
        k_hbm.at[bh, pl.ds(d, 3), :, pl.ds(hblk * hb, hb + 8)], ksc, sem
    )
    copy.start()
    copy.wait()

    # recompute the 27 logit slabs + running max (identical to forward:
    # io-dtype q/k products accumulated f32)
    m = None
    for t, (od, oh, ow) in enumerate(_OFFSETS):
        acc = q_ref[0, 0, 0].astype(f32) * ksc[od, 0, oh:oh + hb, ow:ow + wp].astype(f32)
        for c in range(1, hd):
            acc += q_ref[0, 0, c].astype(f32) * ksc[od, c, oh:oh + hb, ow:ow + wp].astype(f32)
        acc += rpb_ref[head, t]
        lsc[t] = acc
        m = acc if m is None else jnp.maximum(m, acc)

    s = jnp.zeros((hb, wp), jnp.float32)
    for t in range(27):
        e = jnp.exp(lsc[t] - m)
        lsc[t] = e
        s += e
    inv = 1.0 / s

    # d_attn_t = sum_c g_c * offset_t[c]; S = sum_u p_u d_attn_u
    # (g block is (1, 3, 1, hb, wp): component axis at dim 1)
    g0 = g_ref[0, 0, 0]
    g1 = g_ref[0, 1, 0]
    g2 = g_ref[0, 2, 0]
    S = jnp.zeros((hb, wp), jnp.float32)
    for t, (od, oh, ow) in enumerate(_OFFSETS):
        da = (od - 1) * g0 + (oh - 1) * g1 + (ow - 1) * g2
        S += (lsc[t] * inv) * da

    # valid-position mask: hp/wp alignment pads carry garbage q/k/g; dl must
    # be exactly zero there (B2 and drpb read/reduce it)
    row0 = hblk * hb
    valid = (
        (jax.lax.broadcasted_iota(jnp.int32, (hb, wp), 0) + row0 < h)
        & (jax.lax.broadcasted_iota(jnp.int32, (hb, wp), 1) < w)
    ).astype(jnp.float32)

    dq_acc = [jnp.zeros((hb, wp), jnp.float32) for _ in range(hd)]
    for t, (od, oh, ow) in enumerate(_OFFSETS):
        da = (od - 1) * g0 + (oh - 1) * g1 + (ow - 1) * g2
        dl = (lsc[t] * inv) * (da - S) * valid
        # dl persists to HBM in the io dtype (bf16 when q/k are bf16 —
        # halves the largest training-backward buffer); drpb/dq keep the
        # f32 value
        dl_ref[0, 0, t] = dl.astype(dl_ref.dtype)
        # drpb block covers the whole (nblk, 27) tail (a (1,1,1,27) block is
        # rejected by Mosaic when nblk > 1); each program owns row `hblk` of
        # the SMEM block, which persists across the consecutive hblk revisits
        drpb_ref[0, 0, hblk, t] = jnp.sum(dl)
        for c in range(hd):
            dq_acc[c] += dl * ksc[od, c, oh:oh + hb, ow:ow + wp].astype(f32)
    for c in range(hd):
        dq_ref[0, 0, c] = scale * dq_acc[c]


def _bwd2_kernel(hd: int, wp: int, hb: int, hp: int, dtot: int, rows_n: int,
                 slabs_n: int, scale: float, dshift: int,
                 dl_hbm, q_hbm, dk_ref, dls, qs_, sem1, sem2):
    """Per (bh, d, hblk): dk[x] = scale * sum_t dl[x - off_t, t] * q[x - off_t]
    — the inverse-window recurrence of the reference's dk kernel
    (`modet_kernel.cu:209-267`, `include/utils.h:29-38`).

    ``dshift``: 1 when dk indexes the UNPADDED k (default; contributions to
    the zero D-border are dropped, matching zero-pad semantics); 0 when dk
    indexes the PREPADDED k (D+2 slabs, grid axis 1 runs over D+2) — the
    border slabs' cotangents are emitted so the D-sharded path can ship them
    back to neighbor shards (transpose of the halo exchange).

    dl and q are read UNPADDED (no +1-voxel padded HBM copies — those copies
    were the training backward's peak-memory driver: ~1.7 GB at full res).
    Boundary handling without pads:
      * rows: clamped 8-aligned window DMA whose DESTINATION offset absorbs
        the clamp (global row y always lands at buffer sublane y - r0 + 16),
        so every vector load uses a STATIC row offset — dynamic-start VMEM
        slices lower to `tpu.dynamic_rotate`, unimplemented for bf16 data;
        margins are zeroed before the DMA starts;
      * lanes: static lane rolls in f32 (rolls on bf16 vectors are likewise
        unimplemented); the wrapped lane is zero because dl/q are zero beyond
        w (B1's valid mask / XLA zero-pad to wp);
      * depth: 3-slab clamped DMA + per-offset zero factor for slabs
        outside [0, D)."""
    bh = pl.program_id(0)
    d = pl.program_id(1)
    hblk = pl.program_id(2)
    f32 = jnp.float32

    r0 = hblk * hb
    sd0 = jnp.clip(d + dshift - 2, 0, dtot - slabs_n)
    sh0 = jnp.clip(r0 - 8, 0, hp - rows_n)
    sh0 = pl.multiple_of(sh0, 8)
    base = r0 - sh0  # dynamic, a multiple of 8 in [0, 16]
    dst0 = pl.multiple_of(16 - base, 8)

    # zero the sublane margins BEFORE the copy starts (the dynamic dest may
    # overwrite part of them — data wins); rows the shifted reads touch but
    # the DMA doesn't fill are always within [0, 16) ∪ [rows_n, rows_total)
    rows_total = dls.shape[2]
    dls[:, :, :16, :] = jnp.zeros((slabs_n, 27, 16, wp), dls.dtype)
    dls[:, :, rows_n:, :] = jnp.zeros(
        (slabs_n, 27, rows_total - rows_n, wp), dls.dtype
    )
    qs_[:, :, :16, :] = jnp.zeros((slabs_n, hd, 16, wp), qs_.dtype)
    qs_[:, :, rows_n:, :] = jnp.zeros(
        (slabs_n, hd, rows_total - rows_n, wp), qs_.dtype
    )

    cp1 = pltpu.make_async_copy(
        dl_hbm.at[bh, pl.ds(sd0, slabs_n), :, pl.ds(sh0, rows_n)],
        dls.at[:, :, pl.ds(dst0, rows_n)],
        sem1,
    )
    cp2 = pltpu.make_async_copy(
        q_hbm.at[bh, pl.ds(sd0, slabs_n), :, pl.ds(sh0, rows_n)],
        qs_.at[:, :, pl.ds(dst0, rows_n)],
        sem2,
    )
    cp1.start()
    cp2.start()
    cp1.wait()
    cp2.wait()

    def shifted(buf, loc, ch, oh, ow):
        # output row i reads global row r0 + i + 1 - oh = buffer row
        # i + 17 - oh: a static sublane offset
        tile = buf[loc, ch, 17 - oh:17 - oh + hb, :].astype(f32)
        lsh = (ow - 1) % wp  # out[l] = x[l+1-ow] = roll by -(1-ow) (mod wp)
        if lsh:  # static lane roll (f32); the wrapped lane is zero data
            tile = pltpu.roll(tile, lsh, axis=1)
        return tile

    dk_acc = [jnp.zeros((hb, wp), f32) for _ in range(hd)]
    for od in range(3):
        # depth d+dshift-od; zero factor outside [0, D)
        src_d = d + dshift - od
        loc_d = jnp.clip(src_d - sd0, 0, slabs_n - 1)
        mfac = jnp.where((src_d >= 0) & (src_d < dtot), 1.0, 0.0).astype(f32)
        for oh in range(3):
            for ow in range(3):
                t = od * 9 + oh * 3 + ow
                dl = shifted(dls, loc_d, t, oh, ow) * mfac
                for c in range(hd):
                    qv = shifted(qs_, loc_d, c, oh, ow)
                    dk_acc[c] += dl * qv
    for c in range(hd):
        dk_ref[0, 0, c] = scale * dk_acc[c]


def _backward(q, k, rpb, scale, g, interpret=False):
    """NDHWC fused backward: returns (dq, dk, drpb?) matching the oracle VJP."""
    b, d, h, w, heads, hd = q.shape
    bh = b * heads
    qs = q.transpose(0, 4, 1, 5, 2, 3).reshape(bh, d, hd, h, w)
    kpl = k.transpose(0, 4, 1, 5, 2, 3).reshape(bh, d, hd, h, w)
    gs = g.reshape(b, d, h, w, heads, 3).transpose(0, 4, 5, 1, 2, 3)
    gs = gs.reshape(bh, 3, d, h, w)
    dq, dk, drpb = _backward_planes(qs, kpl, rpb, heads, scale, gs, interpret)

    def unplanes(x):
        x = x.reshape(b, heads, d, hd, h, w)
        return x.transpose(0, 2, 4, 5, 1, 3).astype(q.dtype)

    if rpb is None:
        return unplanes(dq), unplanes(dk), None
    return unplanes(dq), unplanes(dk), drpb.astype(rpb.dtype)


def _backward_planes(qs, kpl, rpb, heads, scale, gs, interpret=False,
                     k_prepadded_d=False):
    """Planes-layout fused backward. qs/kpl: (BH, D, hd, H, W) UNSCALED;
    gs: (BH, 3, D, H, W) output cotangent. Returns planes (dq, dk, drpb).

    ``k_prepadded_d``: kpl is (BH, D+2, hd, H, W) with its 1-voxel D border
    (D-sharded path); dk is then returned for the FULL padded extent so the
    border cotangents can ride the halo-exchange transpose back to the
    neighbor shards."""
    bh, d, hd, h, w = qs.shape
    b = bh // heads
    dt = jnp.float32
    # io dtype follows the inputs (bf16 halves the d_logits buffer — the
    # largest training-backward allocation — and the k/q/dl window DMAs)
    io_dt = qs.dtype if qs.dtype == jnp.bfloat16 else dt
    wp = _round_up(w, 128)
    wpk = wp + 128
    hp = _round_up(h, 8)
    hb = _pick_h_block(hp)
    # B1's per-program footprint (double-buffered q/g/dq/dl blocks + k-window
    # + logit scratch) overflows the 16M scoped-VMEM limit at f32 io with
    # hb*wp = 64*256 (measured 17.79M at full res); cap the row block so
    # hb*wp <= 48*256 there. bf16 io halves dl/ksc and fits at 64.
    if io_dt == jnp.float32:
        while hb > 8 and hb * wp > 48 * 256:
            hb = _pick_h_block(hp, hb - 8)
    nblk = hp // hb
    rows_n = min(hb + 16, hp)

    # layouts identical to the forward (q scaled exactly as the forward
    # scaled it — original dtype multiply, then the io cast — so B1's logit
    # recompute bit-matches the forward softmax)
    qs_scaled = jnp.pad(
        (qs * qs.dtype.type(scale)).astype(io_dt),
        ((0, 0),) * 3 + ((0, hp - h), (0, wp - w)),
    )
    kd_pad = (0, 0) if k_prepadded_d else (1, 1)
    kp = jnp.pad(
        kpl.astype(io_dt),
        ((0, 0), kd_pad, (0, 0), (1, hp + 7 - h), (1, wpk - w - 1)),
    )
    gs = jnp.pad(gs.astype(dt), ((0, 0),) * 3 + ((0, hp - h), (0, wp - w)))

    if rpb is None:
        rpb_flat = jnp.zeros((heads, 27), dt)
    else:
        rpb_flat = rpb.astype(dt).reshape(heads, 27)

    # B2 consumes q UNSCALED (scale is applied once on dq/dk outputs);
    # for the common qk_scale=1 quirk the two buffers are one
    if scale == 1.0:
        qs_unscaled = qs_scaled
    else:
        qs_unscaled = jnp.pad(
            qs.astype(io_dt), ((0, 0),) * 3 + ((0, hp - h), (0, wp - w))
        )

    kern1 = functools.partial(_bwd1_kernel, hd, heads, wp, hb, h, w, scale)
    blkspec = lambda nc: pl.BlockSpec(
        (1, 1, nc, hb, wp), lambda i, j, hblk: (i, j, 0, hblk, 0), memory_space=pltpu.VMEM
    )
    # g arrives (BH, 3, D, H, W) — component axis outside the spatial block,
    # matching the planes forward output layout
    g_spec = pl.BlockSpec(
        (1, 3, 1, hb, wp), lambda i, j, hblk: (i, 0, j, hblk, 0), memory_space=pltpu.VMEM
    )
    dq, dl, drpb_parts = pl.pallas_call(
        kern1,
        grid=(bh, d, nblk),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.SMEM),  # rpb
            blkspec(hd),  # q (scaled)
            g_spec,       # g planes
            pl.BlockSpec(memory_space=pltpu.ANY),  # k padded, HBM
        ],
        out_specs=[
            blkspec(hd),  # dq
            blkspec(27),  # d_logits
            pl.BlockSpec((1, 1, nblk, 27), lambda i, j, hblk: (i, j, 0, 0),
                         memory_space=pltpu.SMEM),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((bh, d, hd, hp, wp), dt),
            jax.ShapeDtypeStruct((bh, d, 27, hp, wp), io_dt),
            jax.ShapeDtypeStruct((bh, d, nblk, 27), dt),
        ],
        scratch_shapes=[
            pltpu.VMEM((3, hd, hb + 8, wpk), io_dt),
            pltpu.VMEM((27, hb, wp), dt),
            pltpu.SemaphoreType.DMA(()),
        ],
        interpret=interpret,
    )(rpb_flat, qs_scaled, gs, kp)

    # B2 reads dl and q UNPADDED (clamped windows inside the kernel):
    # no +1-voxel padded HBM copies
    slabs_n = min(3, d)
    dshift = 0 if k_prepadded_d else 1
    d_out = d + 2 if k_prepadded_d else d
    kern2 = functools.partial(
        _bwd2_kernel, hd, wp, hb, hp, d, rows_n, slabs_n, scale, dshift
    )
    dk = pl.pallas_call(
        kern2,
        grid=(bh, d_out, nblk),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.ANY),  # dl (BH, D, 27, HP, WP)
            pl.BlockSpec(memory_space=pltpu.ANY),  # q unscaled
        ],
        out_specs=blkspec(hd),
        out_shape=jax.ShapeDtypeStruct((bh, d_out, hd, hp, wp), dt),
        scratch_shapes=[
            # rows_n + 24: DMA dest reaches 16 + rows_n, static reads reach
            # 17 + hb (≤ rows_n + 17); both fit with an 8-aligned total
            pltpu.VMEM((slabs_n, 27, rows_n + 24, wp), io_dt),
            pltpu.VMEM((slabs_n, hd, rows_n + 24, wp), io_dt),
            pltpu.SemaphoreType.DMA(()),
            pltpu.SemaphoreType.DMA(()),
        ],
        interpret=interpret,
    )(dl, qs_unscaled)

    dq_out = dq[..., :h, :w]
    dk_out = dk[..., :h, :w]
    if rpb is None:
        return dq_out, dk_out, None
    drpb = jnp.sum(drpb_parts.reshape(b, heads, d, nblk, 27), axis=(0, 2, 3))
    return dq_out, dk_out, drpb.reshape(heads, 3, 3, 3)


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
    q, k, rpb = res
    return _backward(q, k, rpb, scale, g, interpret)


modet_attention_pallas.defvjp(_fwd, _bwd)


@functools.partial(jax.custom_vjp, nondiff_argnums=(3, 4, 5, 6))
def modet_attention_planes_diff(qs, kplanes, rpb, heads: int, scale: float = 1.0,
                                interpret: bool = False,
                                k_prepadded_d: bool = False):
    """Differentiable planes-layout attention: same contract as
    `modet_attention_planes`, with the fused Pallas backward (B1/B2) wired
    natively in planes — no relayout on either pass. Used by the planes
    training path. With ``k_prepadded_d`` the k cotangent covers the full
    D+2 padded extent (see `_backward_planes`)."""
    return modet_attention_planes(
        qs, kplanes, rpb, heads, scale, interpret, k_prepadded_d
    )


def _fwd_planes(qs, kplanes, rpb, heads, scale, interpret, k_prepadded_d):
    out = modet_attention_planes(
        qs, kplanes, rpb, heads, scale, interpret, k_prepadded_d
    )
    return out, (qs, kplanes, rpb)


def _bwd_planes(heads, scale, interpret, k_prepadded_d, res, g):
    qs, kplanes, rpb = res
    dq, dk, drpb = _backward_planes(
        qs, kplanes, rpb, heads, scale, g, interpret, k_prepadded_d
    )
    dq = dq.astype(qs.dtype)
    dk = dk.astype(kplanes.dtype)
    if rpb is None:
        return dq, dk, None
    return dq, dk, drpb.astype(rpb.dtype)


modet_attention_planes_diff.defvjp(_fwd_planes, _bwd_planes)
