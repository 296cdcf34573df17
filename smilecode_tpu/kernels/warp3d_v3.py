"""Pallas TPU warp kernel v3: relative-shift candidate loops, channel-batched.

The v2 windowed kernel (`kernels/warp3d.py`) loops over ABSOLUTE (rd, rh)
candidate cells and pays per-candidate crossbar gathers (take_along_axis
chains) — repeated per channel (59 ms at C=1, 187 ms at C=3, full res on
v5e). v3 restructures the whole gather around two hardware facts:

  * `pltpu.roll` (tpu dynamic rotate) shifts a vreg tile across sublanes or
    lanes in O(tile) time — no crossbar;
  * registration flows are SMOOTH: within one (1, 8, W) output tile the
    integer displacement relative to the output position spans only a few
    values per axis.

So instead of "which absolute source cell?" the loops iterate "how far from
the output position?" — relative d-slabs, relative sublane shifts t, and
relative lane shifts s, each spanning a small data-dependent range:

    out[h', w'] = sum_{rd, t, s} mask(celld==rd, relh==t, rels==s)
                  * weight * roll(win[rd], -t)[h'][w' + s]

The mask/weight algebra folds both interpolation corners per axis into the
shift loop (corner +1 at shift s == corner 0 at shift s+1). Masks and
weights are computed ONCE per tile and shared across ALL channels; each
channel adds only a 16-row aligned slice + sublane roll + lane roll + fma.
One program handles one (batch, d', 8-row block) tile x all C channels, and
the (C, KD, 8+KHA, SWp) source window is fetched in ONE DMA.

Window budget (tighter than v2 — the relative formulation needs to cover
only per-tile SPREAD, not absolute offsets): KD=8 d-slabs (d-cell spread
budget KD-2=6), KHA=32 rows (h spread budget KHA-10=22). W displacement
remains unbounded (full rows in the window). `warp_v3_window_violations`
reports tiles exceeding the budget; the guarded wrapper falls back to the
exact oracle for such flows.

This is the TPU equivalent of the reference's grid_sample hot path
(`/root/reference/ModeT/models.py:25-67`, 9 calls per forward incl. full
res). Semantics: align_corners=True, zeros padding, matching
`ops.warp._warp_simple`.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

KD = 8    # window depth slabs (d-cell spread budget = KD-2)
KHA = 32  # window rows (h spread budget ~ KHA-2-8)
HB = 8    # output rows per tile
HMARGIN = 8  # lead rows so aligned 16-row slices exist for negative t


def _round_up(x, m):
    return (x + m - 1) // m * m


def _warp_v3_kernel(c: int, sd: int, sh: int, sw: int,
                    sdp: int, shp: int, swp: int, fwp: int,
                    kd_n: int, kha_n: int, fh: int, fw: int,
                    cd_ref, ch_ref, cw_ref, src_hbm, o_ref, win, sem):
    b = pl.program_id(0)
    hb = pl.program_id(2)

    cdv = cd_ref[0, 0]  # (HB, FWp) f32 absolute sample coords
    chv = ch_ref[0, 0]
    cwv = cw_ref[0, 0]

    fd0 = jnp.floor(cdv)
    fh0 = jnp.floor(chv)
    fw0 = jnp.floor(cwv)
    td = cdv - fd0
    th = chv - fh0
    tw = cwv - fw0
    # cell indices into the padded source (+1 leading pad); pad zeros
    # implement grid_sample's zero padding, so no weight masking is needed
    celld = jnp.clip(fd0, -1.0, float(sd)).astype(jnp.int32) + 1
    cellh = jnp.clip(fh0, -1.0, float(sh)).astype(jnp.int32) + 1
    cellw = jnp.clip(fw0, -1.0, float(sw)).astype(jnp.int32) + 1

    dmin = jnp.clip(jnp.min(celld), 0, sdp - kd_n)
    hmin = jnp.clip((jnp.min(cellh) // 8) * 8, 0, shp - kha_n)
    hmin = pl.multiple_of(hmin, 8)

    # one DMA for ALL channels; rows land at sublane HMARGIN so that the
    # aligned 16-row slices below stay in range for t down to -HMARGIN
    cp = pltpu.make_async_copy(
        src_hbm.at[pl.ds(b * c, c), pl.ds(dmin, kd_n), pl.ds(hmin, kha_n), :],
        win.at[:, :, pl.ds(HMARGIN, kha_n), :],
        sem,
    )
    cp.start()
    # zero the margin rows: they are read (then 0-weighted) by shifted
    # slices, and uninitialized VMEM would leak NaN through 0 * NaN
    rows_total = win.shape[2]
    win[:, :, :HMARGIN, :] = jnp.zeros((c, kd_n, HMARGIN, swp), win.dtype)
    win[:, :, HMARGIN + kha_n:, :] = jnp.zeros(
        (c, kd_n, rows_total - HMARGIN - kha_n, swp), win.dtype
    )

    # relative candidate ranges (data-dependent, usually 2-4 wide)
    rd = jnp.clip(celld - dmin, 0, kd_n - 2)
    hloc = jax.lax.broadcasted_iota(jnp.int32, (HB, fwp), 0)
    wloc = jax.lax.broadcasted_iota(jnp.int32, (HB, fwp), 1)
    relh = jnp.clip(cellh - hmin, 0, kha_n - 2) - hloc
    rels = cellw - wloc

    # loop ranges must come from REAL output positions only: the edge-padded
    # coord lanes/rows repeat a real coordinate while wloc/hloc keep growing,
    # which would blow the shift ranges up to the pad width. Sentinel-masked
    # reductions (scalar splats) — a (1,1)->(8,256) dynamic broadcast is
    # rejected by Mosaic ("Broadcast in both sublanes and lanes").
    real = (wloc < fw) & (hb * HB + hloc < fh)

    # OOB corners get zero weight (grid_sample zeros padding); computed from
    # UNCLIPPED floors — clipping the cell would otherwise alias far-OOB
    # corners onto real voxels
    wd0 = (1.0 - td) * ((fd0 >= 0) & (fd0 <= sd - 1))
    wd1 = td * ((fd0 + 1 >= 0) & (fd0 + 1 <= sd - 1))
    wh0 = (1.0 - th) * ((fh0 >= 0) & (fh0 <= sh - 1))
    wh1 = th * ((fh0 + 1 >= 0) & (fh0 + 1 <= sh - 1))
    tw0 = (1.0 - tw) * ((fw0 >= 0) & (fw0 <= sw - 1))
    tw1 = tw * ((fw0 + 1 >= 0) & (fw0 + 1 <= sw - 1))

    rdmin, rdmax = jnp.min(rd), jnp.max(rd)
    tmin = jnp.min(jnp.where(real, relh, kha_n))
    tmax = jnp.max(jnp.where(real, relh, -HB - 1))
    smin = jnp.min(jnp.where(real, rels, sw + 2))
    smax = jnp.max(jnp.where(real, rels, -fwp))

    cp.wait()

    zero = jnp.zeros((HB, fwp), jnp.float32)

    def rd_body(rd_c, accs):
        wgt_d = jnp.where(rd == rd_c, wd0, 0.0) + jnp.where(rd + 1 == rd_c, wd1, 0.0)

        def t_body(t, accs):
            wgt_dh = wgt_d * (
                jnp.where(relh == t, wh0, 0.0) + jnp.where(relh + 1 == t, wh1, 0.0)
            )
            # aligned 16-row slice containing rows [t, t+8) of this slab,
            # then a sublane roll puts source row (h' + t) at sublane h'.
            # floor-division alignment keeps the slice start a multiple of 8
            # for any sign of t; HMARGIN makes start >= 0 down to t=-8.
            al = (t // 8) * 8
            start = pl.multiple_of(HMARGIN + al, 8)
            sub = t - al  # in [0, 8)

            def s_body(s, accs):
                wgt = wgt_dh * (
                    jnp.where(rels == s, tw0, 0.0) + jnp.where(rels + 1 == s, tw1, 0.0)
                )
                new = []
                for cc in range(c):
                    # f32 before the rolls: Mosaic's dynamic_rotate only
                    # handles 32-bit data (bf16 windows stay bf16 in the DMA
                    # and scratch — only the vreg tile is widened)
                    rows16 = win[cc, rd_c, pl.ds(start, 16), :].astype(jnp.float32)
                    rows8 = pltpu.roll(rows16, -sub, axis=0)[:HB]
                    cand = pltpu.roll(rows8, -s, axis=1)[:, :fwp]
                    new.append(accs[cc] + wgt * cand)
                return tuple(new)

            return jax.lax.fori_loop(smin, smax + 2, s_body, accs)

        return jax.lax.fori_loop(tmin, tmax + 2, t_body, accs)

    accs = jax.lax.fori_loop(rdmin, rdmax + 2, rd_body, (zero,) * c)
    for cc in range(c):
        o_ref[cc, 0] = accs[cc]


def warp3d_planes_v3(planes, cd, ch, cw, c: int, interpret: bool = False):
    """Planes-layout v3 entry: ``planes`` is (B*C, SD, SH, SW) with W minor;
    cd/ch/cw are ABSOLUTE sample coordinates (B, FD, FH, FW). Returns
    (B*C, FD, FH, FW) float32. Drop-in for `warp3d.warp3d_planes` with the
    tighter KD/KHA budget documented in the module docstring."""
    bc = planes.shape[0]
    b = bc // c
    sd, sh, sw = planes.shape[1:]
    fd, fh, fw = cd.shape[1:]

    fhp = _round_up(fh, HB)
    fwp = _round_up(fw, 128)
    pads = ((0, 0), (0, 0), (0, fhp - fh), (0, fwp - fw))
    # edge padding: pad lanes must not distort the tile min/max cell indices
    cd = jnp.pad(cd, pads, mode="edge")
    ch = jnp.pad(ch, pads, mode="edge")
    cw = jnp.pad(cw, pads, mode="edge")

    sdp = sd + 3
    shp = _round_up(sh + 3, 8)
    swp = _round_up(sw + 3, 128)
    # bf16 sources stay bf16 in HBM and in the DMA window (halves the padded
    # source buffer + window traffic); interpolation still accumulates f32
    io_dt = planes.dtype if planes.dtype == jnp.bfloat16 else jnp.float32
    planes = jnp.pad(
        planes.astype(io_dt), ((0, 0), (1, 2), (1, shp - sh - 1), (1, swp - sw - 1))
    )

    kd_n = min(KD, sdp)
    kha_n = min(KHA, shp)
    kernel = functools.partial(
        _warp_v3_kernel, c, sd, sh, sw, sdp, shp, swp, fwp, kd_n, kha_n, fh, fw
    )
    coord_spec = pl.BlockSpec(
        (1, 1, HB, fwp), lambda b, d, hb: (b, d, hb, 0), memory_space=pltpu.VMEM
    )
    out = pl.pallas_call(
        kernel,
        grid=(b, fd, fhp // HB),
        in_specs=[
            coord_spec, coord_spec, coord_spec,
            pl.BlockSpec(memory_space=pl.ANY),  # src planes in HBM
        ],
        out_specs=pl.BlockSpec(
            (c, 1, HB, fwp), lambda b, d, hb: (b, d, hb, 0), memory_space=pltpu.VMEM
        ),
        out_shape=jax.ShapeDtypeStruct((bc, fd, fhp, fwp), jnp.float32),
        scratch_shapes=[
            pltpu.VMEM((c, kd_n, HMARGIN + _round_up(kha_n, 8) + 8, swp), io_dt),
            pltpu.SemaphoreType.DMA(()),
        ],
        interpret=interpret,
    )(cd, ch, cw, planes)
    return out[:, :, :fh, :fw]


def _warp_v3_dflow_kernel(c: int, sd: int, sh: int, sw: int,
                          sdp: int, shp: int, swp: int, fwp: int,
                          kd_n: int, kha_n: int, fh: int, fw: int,
                          cd_ref, ch_ref, cw_ref, g_ref, src_hbm,
                          od_ref, oh_ref, ow_ref, win, sem):
    """d_coords of the v3 warp: same relative-shift loops as the forward,
    with the trilinear value weights replaced by their per-axis derivative
    coefficients. Mirrors the reference autograd through grid_sample
    (`/root/reference/ModeT/models.py:25-67` backward), computed fused:

      d_cd = sum g_c * (wd1' - wd0') * wh * ww * v,  etc.

    where w' are the corner indicator bounds (d(1-t)/dc = -1 on in-bounds
    corners). The cotangent g (C, HB, FWp planes block) multiplies the
    window values channel-by-channel; masks/coefficients are shared."""
    b = pl.program_id(0)
    hb = pl.program_id(2)

    cdv = cd_ref[0, 0]
    chv = ch_ref[0, 0]
    cwv = cw_ref[0, 0]

    fd0 = jnp.floor(cdv)
    fh0 = jnp.floor(chv)
    fw0 = jnp.floor(cwv)
    td = cdv - fd0
    th = chv - fh0
    tw = cwv - fw0
    celld = jnp.clip(fd0, -1.0, float(sd)).astype(jnp.int32) + 1
    cellh = jnp.clip(fh0, -1.0, float(sh)).astype(jnp.int32) + 1
    cellw = jnp.clip(fw0, -1.0, float(sw)).astype(jnp.int32) + 1

    dmin = jnp.clip(jnp.min(celld), 0, sdp - kd_n)
    hmin = jnp.clip((jnp.min(cellh) // 8) * 8, 0, shp - kha_n)
    hmin = pl.multiple_of(hmin, 8)

    cp = pltpu.make_async_copy(
        src_hbm.at[pl.ds(b * c, c), pl.ds(dmin, kd_n), pl.ds(hmin, kha_n), :],
        win.at[:, :, pl.ds(HMARGIN, kha_n), :],
        sem,
    )
    cp.start()
    rows_total = win.shape[2]
    win[:, :, :HMARGIN, :] = jnp.zeros((c, kd_n, HMARGIN, swp), win.dtype)
    win[:, :, HMARGIN + kha_n:, :] = jnp.zeros(
        (c, kd_n, rows_total - HMARGIN - kha_n, swp), win.dtype
    )

    rd = jnp.clip(celld - dmin, 0, kd_n - 2)
    hloc = jax.lax.broadcasted_iota(jnp.int32, (HB, fwp), 0)
    wloc = jax.lax.broadcasted_iota(jnp.int32, (HB, fwp), 1)
    relh = jnp.clip(cellh - hmin, 0, kha_n - 2) - hloc
    rels = cellw - wloc

    real = (wloc < fw) & (hb * HB + hloc < fh)

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

    rdmin, rdmax = jnp.min(rd), jnp.max(rd)
    tmin = jnp.min(jnp.where(real, relh, kha_n))
    tmax = jnp.max(jnp.where(real, relh, -HB - 1))
    smin = jnp.min(jnp.where(real, rels, sw + 2))
    smax = jnp.max(jnp.where(real, rels, -fwp))

    cp.wait()

    zero = jnp.zeros((HB, fwp), jnp.float32)
    g = [g_ref[cc, 0].astype(jnp.float32) for cc in range(c)]

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
            start = pl.multiple_of(HMARGIN + al, 8)
            sub = t - al

            def s_body(s, accs):
                acc_d, acc_h, acc_w = accs
                m_w0 = (rels == s).astype(jnp.float32)
                m_w1 = (rels + 1 == s).astype(jnp.float32)
                wgt_w = m_w0 * tw0 + m_w1 * tw1
                der_w = m_w1 * ind_w1 - m_w0 * ind_w0
                p = zero
                for cc in range(c):
                    # f32 before the rolls (Mosaic: 32-bit-only dynamic_rotate)
                    rows16 = win[cc, rd_c, pl.ds(start, 16), :].astype(jnp.float32)
                    rows8 = pltpu.roll(rows16, -sub, axis=0)[:HB]
                    cand = pltpu.roll(rows8, -s, axis=1)[:, :fwp]
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
    od_ref[0, 0] = acc_d
    oh_ref[0, 0] = acc_h
    ow_ref[0, 0] = acc_w


def warp3d_planes_v3_dflow(planes, cd, ch, cw, g, c: int, interpret: bool = False):
    """d_coords for the v3 planes warp. ``g``: cotangent (B*C, FD, FH, FW)
    float32 planes. Returns (d_cd, d_ch, d_cw), each (B, FD, FH, FW) f32."""
    bc = planes.shape[0]
    b = bc // c
    sd, sh, sw = planes.shape[1:]
    fd, fh, fw = cd.shape[1:]

    fhp = _round_up(fh, HB)
    fwp = _round_up(fw, 128)
    pads = ((0, 0), (0, 0), (0, fhp - fh), (0, fwp - fw))
    cd = jnp.pad(cd, pads, mode="edge")
    ch = jnp.pad(ch, pads, mode="edge")
    cw = jnp.pad(cw, pads, mode="edge")
    g = jnp.pad(g.astype(jnp.float32), pads)  # zero pads: no phantom cotangent

    sdp = sd + 3
    shp = _round_up(sh + 3, 8)
    swp = _round_up(sw + 3, 128)
    io_dt = planes.dtype if planes.dtype == jnp.bfloat16 else jnp.float32
    planes = jnp.pad(
        planes.astype(io_dt), ((0, 0), (1, 2), (1, shp - sh - 1), (1, swp - sw - 1))
    )

    kd_n = min(KD, sdp)
    kha_n = min(KHA, shp)
    kernel = functools.partial(
        _warp_v3_dflow_kernel, c, sd, sh, sw, sdp, shp, swp, fwp, kd_n, kha_n, fh, fw
    )
    coord_spec = pl.BlockSpec(
        (1, 1, HB, fwp), lambda b, d, hb: (b, d, hb, 0), memory_space=pltpu.VMEM
    )
    out_spec = pl.BlockSpec(
        (1, 1, HB, fwp), lambda b, d, hb: (b, d, hb, 0), memory_space=pltpu.VMEM
    )
    shape = jax.ShapeDtypeStruct((b, fd, fhp, fwp), jnp.float32)
    dcd, dch, dcw = pl.pallas_call(
        kernel,
        grid=(b, fd, fhp // HB),
        in_specs=[
            coord_spec, coord_spec, coord_spec,
            pl.BlockSpec(
                (c, 1, HB, fwp), lambda b, d, hb: (b, d, hb, 0),
                memory_space=pltpu.VMEM,
            ),
            pl.BlockSpec(memory_space=pl.ANY),
        ],
        out_specs=(out_spec, out_spec, out_spec),
        out_shape=(shape, shape, shape),
        scratch_shapes=[
            pltpu.VMEM((c, kd_n, HMARGIN + _round_up(kha_n, 8) + 8, swp), io_dt),
            pltpu.SemaphoreType.DMA(()),
        ],
        interpret=interpret,
    )(cd, ch, cw, g, planes)
    return (dcd[:, :, :fh, :fw], dch[:, :, :fh, :fw], dcw[:, :, :fh, :fw])


def warp_v3_window_violations(cd, ch, sd: int, sh: int):
    """Fraction of (1, HB, W) tiles whose (d, h) cell spread exceeds the v3
    window budget (those cells would clamp). cd/ch: absolute coords
    (B, FD, FH, FW)."""
    b, fd, fh, fw = cd.shape
    celld = jnp.floor(cd)
    cellh = jnp.floor(ch)
    fhp = _round_up(fh, HB)
    celld = jnp.pad(celld, ((0, 0), (0, 0), (0, fhp - fh), (0, 0)), mode="edge")
    cellh = jnp.pad(cellh, ((0, 0), (0, 0), (0, fhp - fh), (0, 0)), mode="edge")
    celld = celld.reshape(b, fd, fhp // HB, HB * fw)
    cellh = cellh.reshape(b, fd, fhp // HB, HB * fw)
    d_spread = jnp.max(celld, -1) - jnp.min(celld, -1)
    h_spread = jnp.max(cellh, -1) - jnp.min(cellh, -1)
    bad = (d_spread > KD - 2) | (h_spread > KHA - 10)
    return jnp.mean(bad.astype(jnp.float32))
