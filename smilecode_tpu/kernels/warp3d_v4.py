"""Pallas TPU warp kernel v4: whole-plane programs, relative-shift loops.

v3 (`kernels/warp3d_v3.py`) runs one program per (batch, d', 8-row block):
3840 programs at full res, each issuing a BLOCKING (C, KD, KHA, W) window
DMA before ~8 VPU loop iterations. A device trace of the e2e forward showed
the three full-res warps at ~50 ms combined with near-zero flows — almost
entirely per-program DMA stall, not compute: consecutive 8-row programs
re-fetch 6x-overlapping windows (KHA=32 rows for 8 output rows) and nothing
hides the copy latency.

v4 collapses the h-block grid axis into the program: one program per
(batch, d') fetches ONE (C, KD, Hpadded, W) window covering the full H
extent, then loops over the 8-row blocks in-kernel with the same
relative-shift candidate loops as v3 (per-block data-dependent rd/t/s
ranges, masks and both interpolation corners folded into the shift loop).
Consequences:

  * 24x fewer programs and DMAs at full res; window traffic drops ~5x
    (no row overlap between programs);
  * the h-axis window budget DISAPPEARS: the window holds every padded
    source row, so h-displacement is unbounded (exact for any flow_h), like
    W. Only the d-axis keeps a budget: the per-PLANE d-cell spread must fit
    KD-2 (`warp_v4_window_violations`);
  * the per-(rd, t) sublane roll is hoisted out of the s loop (v3 redid the
    16-row slice + sublane roll for every lane shift);
  * the per-plane dmin and the per-block candidate-loop ranges (rd/t/s
    min/max) are precomputed in XLA and passed through SMEM — the kernel
    does ZERO cross-lane reductions (v3 and early v4 paid 8 per block) and
    the window DMA issues on the first instruction.

VMEM: the window is (C, KD, Hp+24, Wp) in the io dtype; channel counts that
would overflow the budget are split into chunks by the wrapper (ModeT's
shapes all fit in one call). Semantics: align_corners=True, zeros padding,
matching `ops.warp._warp_simple` (reference grid_sample hot path,
`/root/reference/ModeT/models.py:25-67`).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

KD = 8    # window depth slabs (PER-PLANE d-cell spread budget = KD-2)
# 16 output rows per in-kernel block: the per-block fixed costs (8 cross-lane
# min/max reductions, loop setup, weight precompute) dominated at HB=8 —
# doubling the block halves them while the per-element vector work stays flat
HB = 16
HMARGIN = HB  # lead rows so aligned (HB+8)-row slices exist for negative t

# VMEM budget for the (C, KD, rows, Wp) window; larger requests are split
# into channel chunks by the wrapper
_WIN_BYTES_MAX = 8 * 1024 * 1024


def _round_up(x, m):
    return (x + m - 1) // m * m


def _v4_ranges(cd, ch, cw, sd: int, sh: int, sw: int, kd_n: int, fhp: int):
    """XLA-side per-plane dmin + per-(plane, block) candidate-loop ranges,
    matching the in-kernel cell definitions exactly. Returns int32 arrays
    (B, FD) and 6 x (B, FD, NHB) destined for SMEM. cd/ch/cw UNPADDED."""
    b, fd, fh, fw = cd.shape
    celld = jnp.clip(jnp.floor(cd), -1.0, float(sd)).astype(jnp.int32) + 1
    cellh = jnp.clip(jnp.floor(ch), -1.0, float(sh)).astype(jnp.int32) + 1
    cellw = jnp.clip(jnp.floor(cw), -1.0, float(sw)).astype(jnp.int32) + 1
    dmin = jnp.clip(
        jnp.min(celld.reshape(b, fd, fh * fw), -1), 0, (sd + 3) - kd_n
    )
    # slabs the plane actually reads: cell spread + 1 interpolation corner;
    # the kernel issues per-slab conditional DMAs for just these slabs
    # (smooth/near-zero flows need 2-4 of the 8 — the window DMA was the
    # round-5 trace's top warp cost)
    dmax = jnp.max(celld.reshape(b, fd, fh * fw), -1)
    dneed = jnp.clip(dmax - dmin + 2, 2, kd_n)
    rd = jnp.clip(celld - dmin[:, :, None, None], 0, kd_n - 2)
    relh = cellh - jax.lax.broadcasted_iota(jnp.int32, (1, 1, fh, fw), 2)
    rels = cellw - jax.lax.broadcasted_iota(jnp.int32, (1, 1, fh, fw), 3)

    imax, imin = np.iinfo(np.int32).max, np.iinfo(np.int32).min

    def blockmm(x, mode):
        sent = imax if mode == "min" else imin
        xp = jnp.pad(
            jnp.broadcast_to(x, (b, fd, fh, fw)),
            ((0, 0), (0, 0), (0, fhp - fh), (0, 0)), constant_values=sent,
        ).reshape(b, fd, fhp // HB, HB * fw)
        return jnp.min(xp, -1) if mode == "min" else jnp.max(xp, -1)

    return (
        dmin.astype(jnp.int32),
        dneed.astype(jnp.int32),
        blockmm(rd, "min"), blockmm(rd, "max"),
        blockmm(relh, "min"), blockmm(relh, "max"),
        blockmm(rels, "min"), blockmm(rels, "max"),
    )


def _warp_v4_kernel(c: int, sd: int, sh: int, sw: int,
                    sdp: int, shp: int, swp: int, fwp: int,
                    kd_n: int, nhb: int, fh: int, fw: int,
                    dmin_ref, dneed_ref, rdmin_ref, rdmax_ref, tmin_ref,
                    tmax_ref, smin_ref, smax_ref,
                    cd_ref, ch_ref, cw_ref, src_hbm, o_ref, win, sem):
    b = pl.program_id(0)
    dpl = pl.program_id(1)

    # plane-wide d window start comes precomputed through SMEM, so the
    # window DMAs issue immediately (no coords read/reduce on the critical
    # path)
    dmin = dmin_ref[b, dpl]
    # per-slab DMA with a DYNAMIC trip count: only the dneed slabs the
    # plane's cells actually read are fetched (rd loop bounds never reach
    # beyond slab dneed-1, so the unfetched tail is never read). Near-zero/
    # smooth flows need 2-4 of the kd_n slabs — the always-full window DMA
    # was the round-5 trace's top warp cost. The window scratch is slab-
    # LEADING so each copy indexes win.at[j] (the double-buffering idiom);
    # partial d-slices / scalar indices on a MIDDLE dest axis produced
    # silently wrong data on hardware (interpret mode passed).
    dneed = dneed_ref[b, dpl]

    def _slab_copy(j):
        return pltpu.make_async_copy(
            src_hbm.at[pl.ds(b * c, c), dmin + j, :, :],
            win.at[j, :, pl.ds(HMARGIN, shp), :],
            sem.at[j],
        )

    def _issue(j, carry):
        _slab_copy(j).start()
        return carry

    jax.lax.fori_loop(0, dneed, _issue, 0)
    # zero the sublane margins (read by shifted slices, then 0-weighted;
    # uninitialized VMEM would leak NaN through 0 * NaN)
    rows_total = win.shape[2]
    win[:, :, :HMARGIN, :] = jnp.zeros((kd_n, c, HMARGIN, swp), win.dtype)
    win[:, :, HMARGIN + shp:, :] = jnp.zeros(
        (kd_n, c, rows_total - HMARGIN - shp, swp), win.dtype
    )

    hloc = jax.lax.broadcasted_iota(jnp.int32, (HB, fwp), 0)
    wloc = jax.lax.broadcasted_iota(jnp.int32, (HB, fwp), 1)

    def _drain(j, carry):
        _slab_copy(j).wait()
        return carry

    jax.lax.fori_loop(0, dneed, _drain, 0)

    zero = jnp.zeros((HB, fwp), jnp.float32)

    def blk_body(blk, carry):
        r0 = blk * HB
        cdv = cd_ref[0, 0, pl.ds(r0, HB), :]
        chv = ch_ref[0, 0, pl.ds(r0, HB), :]
        cwv = cw_ref[0, 0, pl.ds(r0, HB), :]

        fd0 = jnp.floor(cdv)
        fh0 = jnp.floor(chv)
        fw0 = jnp.floor(cwv)
        td = cdv - fd0
        th = chv - fh0
        tw = cwv - fw0
        # cell indices into the padded source (+1 leading pad); pad zeros
        # implement grid_sample's zero padding
        celld = jnp.clip(fd0, -1.0, float(sd)).astype(jnp.int32) + 1
        cellh = jnp.clip(fh0, -1.0, float(sh)).astype(jnp.int32) + 1
        cellw = jnp.clip(fw0, -1.0, float(sw)).astype(jnp.int32) + 1

        rd = jnp.clip(celld - dmin, 0, kd_n - 2)
        # relative shifts: source row = output row + t (whole padded H is in
        # the window, so t is unbounded = h displacement is exact); lane
        # shift s likewise
        relh = cellh - (r0 + hloc)
        rels = cellw - wloc

        # OOB corners get zero weight, computed from UNCLIPPED floors
        wd0 = (1.0 - td) * ((fd0 >= 0) & (fd0 <= sd - 1))
        wd1 = td * ((fd0 + 1 >= 0) & (fd0 + 1 <= sd - 1))
        wh0 = (1.0 - th) * ((fh0 >= 0) & (fh0 <= sh - 1))
        wh1 = th * ((fh0 + 1 >= 0) & (fh0 + 1 <= sh - 1))
        tw0 = (1.0 - tw) * ((fw0 >= 0) & (fw0 <= sw - 1))
        tw1 = tw * ((fw0 + 1 >= 0) & (fw0 + 1 <= sw - 1))

        # loop ranges precomputed in XLA over REAL output positions only
        rdmin = rdmin_ref[b, dpl, blk]
        rdmax = rdmax_ref[b, dpl, blk]
        tmin = tmin_ref[b, dpl, blk]
        tmax = tmax_ref[b, dpl, blk]
        smin = smin_ref[b, dpl, blk]
        smax = smax_ref[b, dpl, blk]

        def rd_body(rd_c, accs):
            wgt_d = jnp.where(rd == rd_c, wd0, 0.0) + jnp.where(rd + 1 == rd_c, wd1, 0.0)

            def t_body(t, accs):
                wgt_dh = wgt_d * (
                    jnp.where(relh == t, wh0, 0.0) + jnp.where(relh + 1 == t, wh1, 0.0)
                )
                # aligned 16-row slice holding source rows [r0+t, r0+t+8):
                # buffer row of source row y is HMARGIN + y; floor-division
                # alignment keeps the start a multiple of 8 for any sign
                al = (t // 8) * 8
                start = pl.multiple_of(HMARGIN + r0 + al, 8)
                sub = t - al  # in [0, 8)
                # sublane roll hoisted OUT of the s loop (v3 paid it per s):
                # f32 before the rolls — Mosaic's dynamic_rotate is
                # 32-bit-only; the window stays io-dtype (bf16 DMA halves
                # traffic), only the rolled vreg tile widens. The tile is
                # HB+16 = 32 rows (4 vregs), NOT HB+8 = 24: dynamic rotates
                # of 24-row (3-vreg) f32 tiles are silently off by one 8-row
                # granule on the current toolchain (probed 2026-08-21 —
                # 16/32-row rolls exact, 24-row rolls shifted +8; interpret
                # mode does not reproduce it), which made every HB=16 v4
                # output wrong on-chip this round until widened here
                rows = [
                    pltpu.roll(
                        win[rd_c, cc, pl.ds(start, HB + 16), :].astype(jnp.float32),
                        -sub, axis=0,
                    )[:HB]
                    for cc in range(c)
                ]

                def s_body(s, accs):
                    wgt = wgt_dh * (
                        jnp.where(rels == s, tw0, 0.0) + jnp.where(rels + 1 == s, tw1, 0.0)
                    )
                    new = []
                    for cc in range(c):
                        cand = pltpu.roll(rows[cc], -s, axis=1)[:, :fwp]
                        new.append(accs[cc] + wgt * cand)
                    return tuple(new)

                return jax.lax.fori_loop(smin, smax + 2, s_body, accs)

            return jax.lax.fori_loop(tmin, tmax + 2, t_body, accs)

        accs = jax.lax.fori_loop(rdmin, rdmax + 2, rd_body, (zero,) * c)
        for cc in range(c):
            o_ref[cc, 0, pl.ds(r0, HB), :] = accs[cc]
        return carry

    jax.lax.fori_loop(0, nhb, blk_body, 0)


def _chunk_channels(c: int, kd_n: int, rows_total: int, swp: int, itemsize: int):
    """Largest channel chunk whose window fits the VMEM budget."""
    per_c = kd_n * rows_total * swp * itemsize
    return max(1, min(c, _WIN_BYTES_MAX // max(per_c, 1)))


def warp3d_planes_v4(planes, cd, ch, cw, c: int, interpret: bool = False,
                     kd: int = KD):
    """Planes-layout v4 entry: ``planes`` is (B*C, SD, SH, SW) with W minor;
    cd/ch/cw are ABSOLUTE sample coordinates (B, FD, FH, FW). Returns
    (B*C, FD, FH, FW) float32. Exact whenever the per-plane d-cell spread
    fits kd-2 (`warp_v4_window_violations`); h/w displacement unbounded.

    ``kd`` widens the d window budget: the guard ladder escalates KD -> a
    wide window (16) for large-but-smooth flows before giving up on the
    kernel (the candidate-loop COST is sized by the per-block data ranges,
    not by kd, so a wide window on a smooth flow stays cheap — only the
    window DMA grows)."""
    bc = planes.shape[0]
    b = bc // c
    sd, sh, sw = planes.shape[1:]
    fd, fh, fw = cd.shape[1:]

    fhp = _round_up(fh, HB)
    fwp = _round_up(fw, 128)

    sdp = sd + 3
    shp = _round_up(sh + 3, 8)
    swp = _round_up(sw + 3, 128)
    io_dt = planes.dtype if planes.dtype == jnp.bfloat16 else jnp.float32
    kd_n = min(kd, sdp)
    rows_total = HMARGIN + shp + HB + 16

    cmax = _chunk_channels(c, kd_n, rows_total, swp, np.dtype(io_dt).itemsize)
    if cmax < c:
        # split channels into window-budget-sized chunks (rare: ModeT's
        # shapes all fit); per-b channel slices via a (B, C, ...) view
        grouped = planes.reshape(b, c, sd, sh, sw)
        outs = []
        for c0 in range(0, c, cmax):
            cn = min(cmax, c - c0)
            chunk = grouped[:, c0:c0 + cn].reshape(b * cn, sd, sh, sw)
            outs.append(
                warp3d_planes_v4(chunk, cd, ch, cw, cn, interpret, kd)
                .reshape(b, cn, fd, fh, fw)
            )
        return jnp.concatenate(outs, axis=1).reshape(b * c, fd, fh, fw)

    ranges = _v4_ranges(cd, ch, cw, sd, sh, sw, kd_n, fhp)

    pads = ((0, 0), (0, 0), (0, fhp - fh), (0, fwp - fw))
    # edge padding: pad lanes must not distort the per-element cell indices
    cd = jnp.pad(cd, pads, mode="edge")
    ch = jnp.pad(ch, pads, mode="edge")
    cw = jnp.pad(cw, pads, mode="edge")

    planes = jnp.pad(
        planes.astype(io_dt), ((0, 0), (1, 2), (1, shp - sh - 1), (1, swp - sw - 1))
    )

    kernel = functools.partial(
        _warp_v4_kernel, c, sd, sh, sw, sdp, shp, swp, fwp, kd_n, fhp // HB, fh, fw
    )
    coord_spec = pl.BlockSpec(
        (1, 1, fhp, fwp), lambda b, d: (b, d, 0, 0), memory_space=pltpu.VMEM
    )
    smem_spec = pl.BlockSpec(memory_space=pltpu.SMEM)
    out = pl.pallas_call(
        kernel,
        grid=(b, fd),
        in_specs=[smem_spec] * 8 + [
            coord_spec, coord_spec, coord_spec,
            pl.BlockSpec(memory_space=pl.ANY),  # src planes in HBM
        ],
        out_specs=pl.BlockSpec(
            (c, 1, fhp, fwp), lambda b, d: (b, d, 0, 0), memory_space=pltpu.VMEM
        ),
        out_shape=jax.ShapeDtypeStruct((bc, fd, fhp, fwp), jnp.float32),
        scratch_shapes=[
            pltpu.VMEM((kd_n, c, rows_total, swp), io_dt),
            pltpu.SemaphoreType.DMA((kd_n,)),
        ],
        interpret=interpret,
    )(*ranges, cd, ch, cw, planes)
    return out[:, :, :fh, :fw]


def _warp_v4_dflow_kernel(c: int, sd: int, sh: int, sw: int,
                          sdp: int, shp: int, swp: int, fwp: int,
                          kd_n: int, nhb: int, fh: int, fw: int,
                          dmin_ref, dneed_ref, rdmin_ref, rdmax_ref, tmin_ref,
                          tmax_ref, smin_ref, smax_ref,
                          cd_ref, ch_ref, cw_ref, g_ref, src_hbm,
                          od_ref, oh_ref, ow_ref, win, sem):
    """d_coords of the v4 warp: the forward's loops with the trilinear value
    weights replaced by their per-axis derivative coefficients (see
    `warp3d_v3._warp_v3_dflow_kernel`); whole-plane program structure,
    SMEM-precomputed dmin/dneed/loop ranges and chunked conditional window
    DMA like the forward."""
    b = pl.program_id(0)
    dpl = pl.program_id(1)

    dmin = dmin_ref[b, dpl]
    dneed = dneed_ref[b, dpl]

    def _slab_copy(j):
        return pltpu.make_async_copy(
            src_hbm.at[pl.ds(b * c, c), dmin + j, :, :],
            win.at[j, :, pl.ds(HMARGIN, shp), :],
            sem.at[j],
        )

    def _issue(j, carry):
        _slab_copy(j).start()
        return carry

    jax.lax.fori_loop(0, dneed, _issue, 0)
    rows_total = win.shape[2]
    win[:, :, :HMARGIN, :] = jnp.zeros((kd_n, c, HMARGIN, swp), win.dtype)
    win[:, :, HMARGIN + shp:, :] = jnp.zeros(
        (kd_n, c, rows_total - HMARGIN - shp, swp), win.dtype
    )

    hloc = jax.lax.broadcasted_iota(jnp.int32, (HB, fwp), 0)
    wloc = jax.lax.broadcasted_iota(jnp.int32, (HB, fwp), 1)

    def _drain(j, carry):
        _slab_copy(j).wait()
        return carry

    jax.lax.fori_loop(0, dneed, _drain, 0)

    zero = jnp.zeros((HB, fwp), jnp.float32)

    def blk_body(blk, carry):
        r0 = blk * HB
        cdv = cd_ref[0, 0, pl.ds(r0, HB), :]
        chv = ch_ref[0, 0, pl.ds(r0, HB), :]
        cwv = cw_ref[0, 0, pl.ds(r0, HB), :]
        g = [g_ref[cc, 0, pl.ds(r0, HB), :].astype(jnp.float32) for cc in range(c)]

        fd0 = jnp.floor(cdv)
        fh0 = jnp.floor(chv)
        fw0 = jnp.floor(cwv)
        td = cdv - fd0
        th = chv - fh0
        tw = cwv - fw0
        celld = jnp.clip(fd0, -1.0, float(sd)).astype(jnp.int32) + 1
        cellh = jnp.clip(fh0, -1.0, float(sh)).astype(jnp.int32) + 1
        cellw = jnp.clip(fw0, -1.0, float(sw)).astype(jnp.int32) + 1

        rd = jnp.clip(celld - dmin, 0, kd_n - 2)
        relh = cellh - (r0 + hloc)
        rels = cellw - wloc

        ind_d0 = ((fd0 >= 0) & (fd0 <= sd - 1)).astype(jnp.float32)
        ind_d1 = ((fd0 + 1 >= 0) & (fd0 + 1 <= sd - 1)).astype(jnp.float32)
        ind_h0 = ((fh0 >= 0) & (fh0 <= sh - 1)).astype(jnp.float32)
        ind_h1 = ((fh0 + 1 >= 0) & (fh0 + 1 <= sh - 1)).astype(jnp.float32)
        ind_w0 = ((fw0 >= 0) & (fw0 <= sw - 1)).astype(jnp.float32)
        ind_w1 = ((fw0 + 1 >= 0) & (fw0 + 1 <= sw - 1)).astype(jnp.float32)
        wd0 = (1.0 - td) * ind_d0
        wd1 = td * ind_d1
        wh0 = (1.0 - th) * ind_h0
        wh1 = th * ind_h1
        tw0 = (1.0 - tw) * ind_w0
        tw1 = tw * ind_w1

        rdmin = rdmin_ref[b, dpl, blk]
        rdmax = rdmax_ref[b, dpl, blk]
        tmin = tmin_ref[b, dpl, blk]
        tmax = tmax_ref[b, dpl, blk]
        smin = smin_ref[b, dpl, blk]
        smax = smax_ref[b, dpl, blk]

        def rd_body(rd_c, accs):
            m_d0 = (rd == rd_c).astype(jnp.float32)
            m_d1 = (rd + 1 == rd_c).astype(jnp.float32)
            wgt_d = m_d0 * wd0 + m_d1 * wd1
            der_d = m_d1 * ind_d1 - m_d0 * ind_d0

            def t_body(t, accs):
                m_h0 = (relh == t).astype(jnp.float32)
                m_h1 = (relh + 1 == t).astype(jnp.float32)
                wgt_h = m_h0 * wh0 + m_h1 * wh1
                der_h = m_h1 * ind_h1 - m_h0 * ind_h0
                al = (t // 8) * 8
                start = pl.multiple_of(HMARGIN + r0 + al, 8)
                sub = t - al
                rows = [
                    pltpu.roll(
                        win[rd_c, cc, pl.ds(start, HB + 16), :].astype(jnp.float32),
                        -sub, axis=0,
                    )[:HB]
                    for cc in range(c)
                ]

                def s_body(s, accs):
                    acc_d, acc_h, acc_w = accs
                    m_w0 = (rels == s).astype(jnp.float32)
                    m_w1 = (rels + 1 == s).astype(jnp.float32)
                    wgt_w = m_w0 * tw0 + m_w1 * tw1
                    der_w = m_w1 * ind_w1 - m_w0 * ind_w0
                    p = zero
                    for cc in range(c):
                        cand = pltpu.roll(rows[cc], -s, axis=1)[:, :fwp]
                        p = p + g[cc] * cand
                    acc_d = acc_d + der_d * wgt_h * wgt_w * p
                    acc_h = acc_h + wgt_d * der_h * wgt_w * p
                    acc_w = acc_w + wgt_d * wgt_h * der_w * p
                    return (acc_d, acc_h, acc_w)

                return jax.lax.fori_loop(smin, smax + 2, s_body, accs)

            return jax.lax.fori_loop(tmin, tmax + 2, t_body, accs)

        acc_d, acc_h, acc_w = jax.lax.fori_loop(
            rdmin, rdmax + 2, rd_body, (zero, zero, zero)
        )
        od_ref[0, 0, pl.ds(r0, HB), :] = acc_d
        oh_ref[0, 0, pl.ds(r0, HB), :] = acc_h
        ow_ref[0, 0, pl.ds(r0, HB), :] = acc_w
        return carry

    jax.lax.fori_loop(0, nhb, blk_body, 0)


def warp3d_planes_v4_dflow(planes, cd, ch, cw, g, c: int, interpret: bool = False,
                           kd: int = KD):
    """d_coords for the v4 planes warp. ``g``: cotangent (B*C, FD, FH, FW)
    float32 planes. Returns (d_cd, d_ch, d_cw), each (B, FD, FH, FW) f32."""
    bc = planes.shape[0]
    b = bc // c
    sd, sh, sw = planes.shape[1:]
    fd, fh, fw = cd.shape[1:]

    fhp = _round_up(fh, HB)
    fwp = _round_up(fw, 128)

    sdp = sd + 3
    shp = _round_up(sh + 3, 8)
    swp = _round_up(sw + 3, 128)
    io_dt = planes.dtype if planes.dtype == jnp.bfloat16 else jnp.float32
    kd_n = min(kd, sdp)
    rows_total = HMARGIN + shp + HB + 16

    cmax = _chunk_channels(c, kd_n, rows_total, swp, np.dtype(io_dt).itemsize)
    if cmax < c:
        grouped = planes.reshape(b, c, sd, sh, sw)
        gg = g.reshape(b, c, fd, fh, fw)
        dd = jnp.zeros((b, fd, fh, fw), jnp.float32)
        dh = jnp.zeros((b, fd, fh, fw), jnp.float32)
        dw = jnp.zeros((b, fd, fh, fw), jnp.float32)
        for c0 in range(0, c, cmax):
            cn = min(cmax, c - c0)
            chunk = grouped[:, c0:c0 + cn].reshape(b * cn, sd, sh, sw)
            gchunk = gg[:, c0:c0 + cn].reshape(b * cn, fd, fh, fw)
            pd, ph, pw = warp3d_planes_v4_dflow(
                chunk, cd, ch, cw, gchunk, cn, interpret, kd
            )
            dd, dh, dw = dd + pd, dh + ph, dw + pw
        return dd, dh, dw

    ranges = _v4_ranges(cd, ch, cw, sd, sh, sw, kd_n, fhp)

    pads = ((0, 0), (0, 0), (0, fhp - fh), (0, fwp - fw))
    cd = jnp.pad(cd, pads, mode="edge")
    ch = jnp.pad(ch, pads, mode="edge")
    cw = jnp.pad(cw, pads, mode="edge")
    g = jnp.pad(g.astype(jnp.float32), pads)  # zero pads: no phantom cotangent

    planes = jnp.pad(
        planes.astype(io_dt), ((0, 0), (1, 2), (1, shp - sh - 1), (1, swp - sw - 1))
    )

    kernel = functools.partial(
        _warp_v4_dflow_kernel, c, sd, sh, sw, sdp, shp, swp, fwp, kd_n,
        fhp // HB, fh, fw
    )
    coord_spec = pl.BlockSpec(
        (1, 1, fhp, fwp), lambda b, d: (b, d, 0, 0), memory_space=pltpu.VMEM
    )
    out_spec = pl.BlockSpec(
        (1, 1, fhp, fwp), lambda b, d: (b, d, 0, 0), memory_space=pltpu.VMEM
    )
    shape = jax.ShapeDtypeStruct((b, fd, fhp, fwp), jnp.float32)
    smem_spec = pl.BlockSpec(memory_space=pltpu.SMEM)
    dcd, dch, dcw = pl.pallas_call(
        kernel,
        grid=(b, fd),
        in_specs=[smem_spec] * 8 + [
            coord_spec, coord_spec, coord_spec,
            pl.BlockSpec(
                (c, 1, fhp, fwp), lambda b, d: (b, d, 0, 0),
                memory_space=pltpu.VMEM,
            ),
            pl.BlockSpec(memory_space=pl.ANY),
        ],
        out_specs=(out_spec, out_spec, out_spec),
        out_shape=(shape, shape, shape),
        scratch_shapes=[
            pltpu.VMEM((kd_n, c, rows_total, swp), io_dt),
            pltpu.SemaphoreType.DMA((kd_n,)),
        ],
        interpret=interpret,
    )(*ranges, cd, ch, cw, g, planes)
    return (dcd[:, :, :fh, :fw], dch[:, :, :fh, :fw], dcw[:, :, :fh, :fw])


def warp_v4_window_violations(cd, sd: int, kd: int = KD):
    """Fraction of (b, d') PLANES whose d-cell spread exceeds the v4 window
    budget (those cells would clamp). Only the d axis has a budget: the v4
    window holds every padded H row and full W rows."""
    b, fd, fh, fw = cd.shape
    celld = jnp.floor(cd).reshape(b, fd, fh * fw)
    d_spread = jnp.max(celld, -1) - jnp.min(celld, -1)
    return jnp.mean((d_spread > kd - 2).astype(jnp.float32))
