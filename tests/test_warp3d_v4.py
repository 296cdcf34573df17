"""warp3d_v4 (whole-plane programs) kernel vs the naive oracle.

Covers: odd level-5 dims, channel batching, multi-chunk lanes (fw > 128),
OOB zeros padding, negative displacements, LARGE h displacement (beyond the
v3 KHA budget — v4 has no h budget), bf16 windows, the fused d_coords
adjoint, channel chunking, and the per-plane d-spread guard.
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from smilecode_tpu.kernels import warp3d_v4 as W4
from smilecode_tpu.kernels.warp3d_v4 import (
    KD,
    warp3d_planes_v4,
    warp3d_planes_v4_dflow,
    warp_v4_window_violations,
)
from smilecode_tpu.ops.warp import _warp_simple, base_grid

RNG = np.random.default_rng(12)


def smooth_flow(shape, amp, freq):
    g = np.stack(
        np.meshgrid(*[np.linspace(0, freq * np.pi, s) for s in shape], indexing="ij"),
        -1,
    )
    fl = amp * np.stack(
        [
            np.sin(g[..., 0] + i) * np.cos(g[..., 1] - i) * np.sin(g[..., 2] + 2 * i)
            for i in range(3)
        ],
        -1,
    )
    return jnp.asarray(fl[None].astype(np.float32))


def v4(src, fl, interpret=True):
    b, d, h, w, c = src.shape
    coords = base_grid(d, h, w, jnp.float32)[None] + fl
    planes = src.transpose(0, 4, 1, 2, 3).reshape(b * c, d, h, w)
    out = warp3d_planes_v4(
        planes, coords[..., 0], coords[..., 1], coords[..., 2], c, interpret=interpret
    )
    return out.reshape(b, c, d, h, w).transpose(0, 2, 3, 4, 1)


@pytest.mark.parametrize(
    "shape,c,amp,freq",
    [
        ((8, 16, 16), 1, 0.8, 1),
        ((10, 12, 10), 3, 2.0, 2),   # level-5 odd dims
        ((16, 24, 16), 4, 3.0, 2),   # channel batching
        ((12, 16, 140), 2, 1.5, 3),  # fw > 128 -> multi-chunk lanes
    ],
)
def test_matches_oracle(shape, c, amp, freq):
    src = jnp.asarray(RNG.standard_normal((1, *shape, c)).astype(np.float32))
    fl = smooth_flow(shape, amp, freq)
    ref = _warp_simple(src, fl)
    out = v4(src, fl)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=2e-5)


def test_large_h_displacement_exact():
    """h displacement far beyond the v3 KHA budget: v4's window holds every
    padded row, so this must stay exact (no clamping)."""
    shape, c = (8, 48, 16), 2
    src = jnp.asarray(RNG.standard_normal((1, *shape, c)).astype(np.float32))
    fl = np.zeros((1, *shape, 3), np.float32)
    # alternating +-20-row jumps within each 8-row tile
    fl[:, :, ::2, :, 1] = 20.0
    fl[:, :, 1::2, :, 1] = -20.0
    fl = jnp.asarray(fl)
    ref = _warp_simple(src, fl)
    out = v4(src, fl)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=2e-5)
    coords = base_grid(*shape, jnp.float32)[None] + fl
    assert float(warp_v4_window_violations(coords[..., 0], shape[0])) == 0.0


@pytest.mark.parametrize("shift", [4.75, -3.3])
def test_constant_shift_oob_zeros(shift):
    src = jnp.asarray(RNG.standard_normal((1, 12, 16, 16, 2)).astype(np.float32))
    fl = jnp.full((1, 12, 16, 16, 3), shift, jnp.float32)
    ref = _warp_simple(src, fl)
    out = v4(src, fl)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=2e-5)


def test_bf16_window():
    src = jnp.asarray(RNG.standard_normal((1, 12, 16, 16, 2)).astype(np.float32))
    fl = smooth_flow((12, 16, 16), 1.5, 2)
    ref = _warp_simple(src, fl)
    out = v4(src.astype(jnp.bfloat16), fl)
    assert out.dtype == jnp.float32
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=0.02)


def test_channel_chunking(monkeypatch):
    """Shrunken VMEM budget forces the channel-chunked path; result must not
    change."""
    shape, c = (10, 12, 10), 5
    src = jnp.asarray(RNG.standard_normal((1, *shape, c)).astype(np.float32))
    fl = smooth_flow(shape, 1.2, 2)
    ref = v4(src, fl)
    monkeypatch.setattr(W4, "_WIN_BYTES_MAX", 64 * 1024)
    out = v4(src, fl)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=1e-6)


@pytest.mark.parametrize(
    "shape,c",
    [((10, 12, 10), 3), ((12, 16, 16), 2)],
)
def test_dflow_matches_oracle_autodiff(shape, c):
    d, h, w = shape
    src = jnp.asarray(RNG.standard_normal((1, d, h, w, c)).astype(np.float32))
    fl = smooth_flow(shape, 1.5, 2)
    g = jnp.asarray(RNG.standard_normal((1, c, d, h, w)).astype(np.float32))

    coords = base_grid(d, h, w, jnp.float32)[None] + fl

    def oracle(cd, ch, cw):
        crd = jnp.stack([cd, ch, cw], -1)
        out = _warp_simple(src, crd - base_grid(d, h, w, jnp.float32)[None])
        return jnp.sum(out.transpose(0, 4, 1, 2, 3) * g.reshape(1, c, d, h, w))

    ref = jax.grad(oracle, argnums=(0, 1, 2))(
        coords[..., 0], coords[..., 1], coords[..., 2]
    )
    planes = src.transpose(0, 4, 1, 2, 3).reshape(c, d, h, w)
    got = warp3d_planes_v4_dflow(
        planes, coords[..., 0], coords[..., 1], coords[..., 2],
        g.reshape(c, d, h, w), c, interpret=True,
    )
    for r, o in zip(ref, got):
        np.testing.assert_allclose(np.asarray(o), np.asarray(r), atol=3e-5)


def test_wide_window_exact_where_narrow_clamps():
    """kd=16 wide window: exact on flows whose per-plane d-cell spread beats
    the default KD=8 budget (the realistic-checkpoint regime: +-3..13 voxel
    smooth flows); the same flow through the narrow window clamps."""
    shape, c = (24, 16, 16), 2
    src = jnp.asarray(RNG.standard_normal((1, *shape, c)).astype(np.float32))
    fl = smooth_flow(shape, 5.0, 1)  # plane d-spread ~7..10: > 6, <= 14
    coords = base_grid(*shape, jnp.float32)[None] + fl
    assert float(warp_v4_window_violations(coords[..., 0], shape[0])) > 0.0
    assert float(warp_v4_window_violations(coords[..., 0], shape[0], 16)) == 0.0

    ref = _warp_simple(src, fl)
    planes = src.transpose(0, 4, 1, 2, 3).reshape(c, *shape)
    wide = warp3d_planes_v4(
        planes, coords[..., 0], coords[..., 1], coords[..., 2], c,
        interpret=True, kd=16,
    ).reshape(1, c, *shape).transpose(0, 2, 3, 4, 1)
    np.testing.assert_allclose(np.asarray(wide), np.asarray(ref), atol=2e-5)

    narrow = v4(src, fl)
    assert float(jnp.abs(narrow - ref).max()) > 0.05  # narrow budget clamps


def test_wide_window_dflow_matches_oracle():
    shape, c = (24, 16, 16), 2
    d, h, w = shape
    src = jnp.asarray(RNG.standard_normal((1, *shape, c)).astype(np.float32))
    fl = smooth_flow(shape, 5.0, 1)
    g = jnp.asarray(RNG.standard_normal((1, c, d, h, w)).astype(np.float32))
    coords = base_grid(d, h, w, jnp.float32)[None] + fl

    def oracle(cd, ch, cw):
        crd = jnp.stack([cd, ch, cw], -1)
        out = _warp_simple(src, crd - base_grid(d, h, w, jnp.float32)[None])
        return jnp.sum(out.transpose(0, 4, 1, 2, 3) * g.reshape(1, c, d, h, w))

    ref = jax.grad(oracle, argnums=(0, 1, 2))(
        coords[..., 0], coords[..., 1], coords[..., 2]
    )
    planes = src.transpose(0, 4, 1, 2, 3).reshape(c, d, h, w)
    got = warp3d_planes_v4_dflow(
        planes, coords[..., 0], coords[..., 1], coords[..., 2],
        g.reshape(c, d, h, w), c, interpret=True, kd=16,
    )
    for r, o in zip(ref, got):
        np.testing.assert_allclose(np.asarray(o), np.asarray(r), atol=3e-5)


def test_violations_guard():
    shape = (16, 16, 16)
    smooth = smooth_flow(shape, 1.5, 2)
    coords = base_grid(*shape, jnp.float32)[None] + smooth
    assert float(warp_v4_window_violations(coords[..., 0], 16)) == 0.0

    # alternating +-KD depth displacement exceeds the PER-PLANE d budget
    wild = np.zeros((1, *shape, 3), np.float32)
    wild[:, :, ::2, :, 0] = KD
    wild[:, :, 1::2, :, 0] = -KD
    coords = base_grid(*shape, jnp.float32)[None] + jnp.asarray(wild)
    assert float(warp_v4_window_violations(coords[..., 0], 16)) > 0.5
