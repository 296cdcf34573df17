"""warp3d_v3 (relative-shift, channel-batched) kernel vs the naive oracle.

Covers: odd level-5 dims, channel batching, multi-chunk lanes (fw > 128),
OOB zeros padding, negative displacements (HMARGIN path), bf16 windows,
and the violations guard math.
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from smilecode_tpu.kernels.warp3d_v3 import (
    KD,
    KHA,
    warp3d_planes_v3,
    warp_v3_window_violations,
)
from smilecode_tpu.ops.warp import _warp_simple, base_grid

RNG = np.random.default_rng(11)


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


def v3(src, fl, interpret=True):
    b, d, h, w, c = src.shape
    coords = base_grid(d, h, w, jnp.float32)[None] + fl
    planes = src.transpose(0, 4, 1, 2, 3).reshape(b * c, d, h, w)
    out = warp3d_planes_v3(
        planes, coords[..., 0], coords[..., 1], coords[..., 2], c, interpret=interpret
    )
    return out.reshape(b, c, d, h, w).transpose(0, 2, 3, 4, 1)


@pytest.mark.parametrize(
    "shape,c,amp,freq",
    [
        ((8, 16, 16), 1, 0.8, 1),
        ((10, 12, 10), 3, 2.0, 2),   # level-5 odd dims
        ((16, 24, 16), 8, 3.0, 2),   # channel batching
        ((12, 16, 140), 2, 1.5, 3),  # fw > 128 -> multi-chunk lanes
    ],
)
def test_matches_oracle(shape, c, amp, freq):
    src = jnp.asarray(RNG.standard_normal((1, *shape, c)).astype(np.float32))
    fl = smooth_flow(shape, amp, freq)
    ref = _warp_simple(src, fl)
    out = v3(src, fl)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=2e-5)


@pytest.mark.parametrize("shift", [4.75, -3.3])
def test_constant_shift_oob_zeros(shift):
    """Constant displacement: interior exact, outside-volume samples zero
    (grid_sample zeros padding). Negative shift exercises the HMARGIN
    (negative-t) path."""
    src = jnp.asarray(RNG.standard_normal((1, 12, 16, 16, 2)).astype(np.float32))
    fl = jnp.full((1, 12, 16, 16, 3), shift, jnp.float32)
    ref = _warp_simple(src, fl)
    out = v3(src, fl)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=2e-5)


def test_bf16_window():
    src = jnp.asarray(RNG.standard_normal((1, 12, 16, 16, 2)).astype(np.float32))
    fl = smooth_flow((12, 16, 16), 1.5, 2)
    ref = _warp_simple(src, fl)
    out = v3(src.astype(jnp.bfloat16), fl)
    assert out.dtype == jnp.float32
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=0.02)


@pytest.mark.parametrize(
    "shape,c",
    [((10, 12, 10), 3), ((12, 16, 16), 2)],
)
def test_dflow_matches_oracle_autodiff(shape, c):
    """The fused d_coords adjoint vs jax.grad through the naive oracle."""
    from smilecode_tpu.kernels.warp3d_v3 import warp3d_planes_v3_dflow

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
    got = warp3d_planes_v3_dflow(
        planes, coords[..., 0], coords[..., 1], coords[..., 2],
        g.reshape(c, d, h, w), c, interpret=True,
    )
    for r, o in zip(ref, got):
        np.testing.assert_allclose(np.asarray(o), np.asarray(r), atol=3e-5)


def test_planes_hw_vjp_matches_oracle():
    """The wired custom VJP of the planes hardware warp (v3 fwd + fused
    d_flow kernel + oracle-transpose d_src) vs autodiff through the oracle
    planes warp, in interpret mode."""
    from smilecode_tpu.models import modet_planes as mp

    shape, c = (10, 12, 10), 3
    d, h, w = shape
    src = jnp.asarray(RNG.standard_normal((1, c, d, h, w)).astype(np.float32))
    fl = smooth_flow(shape, 1.2, 2).transpose(0, 4, 1, 2, 3)  # (1, 3, D, H, W)
    g = jnp.asarray(RNG.standard_normal((1, c, d, h, w)).astype(np.float32))

    def loss_hw(s, f):
        return jnp.sum(mp._warp_planes_hw(s, f, True) * g)

    def loss_ref(s, f):
        return jnp.sum(mp._warp_planes_ref(s, f) * g)

    old = mp._V3_INTERPRET
    mp._V3_INTERPRET = True
    try:
        out_hw = mp._warp_planes_hw(src, fl, True)
        ds_hw, df_hw = jax.grad(loss_hw, argnums=(0, 1))(src, fl)
    finally:
        mp._V3_INTERPRET = old
    out_ref = mp._warp_planes_ref(src, fl)
    ds_ref, df_ref = jax.grad(loss_ref, argnums=(0, 1))(src, fl)

    np.testing.assert_allclose(np.asarray(out_hw), np.asarray(out_ref), atol=2e-5)
    np.testing.assert_allclose(np.asarray(ds_hw), np.asarray(ds_ref), atol=3e-5)
    np.testing.assert_allclose(np.asarray(df_hw), np.asarray(df_ref), atol=3e-5)


@pytest.mark.slow  # ~15 s; oracle-fallback routing also covered by the switch tests
def test_planes_hw_guard_falls_back_exact():
    """Wild flows (beyond the v3 window budget) must route through the
    oracle fallback and stay exact, fwd and bwd."""
    from smilecode_tpu.models import modet_planes as mp

    shape, c = (16, 16, 16), 2
    d, h, w = shape
    src = jnp.asarray(RNG.standard_normal((1, c, d, h, w)).astype(np.float32))
    wild = np.zeros((1, 3, d, h, w), np.float32)
    wild[:, 0, :, ::2] = KD
    wild[:, 0, :, 1::2] = -KD
    fl = jnp.asarray(wild)
    g = jnp.asarray(RNG.standard_normal((1, c, d, h, w)).astype(np.float32))

    def loss_hw(s, f):
        return jnp.sum(mp._warp_planes_hw(s, f, True) * g)

    def loss_ref(s, f):
        return jnp.sum(mp._warp_planes_ref(s, f) * g)

    old = mp._V3_INTERPRET
    mp._V3_INTERPRET = True
    try:
        out_hw = mp._warp_planes_hw(src, fl, True)
        ds_hw, df_hw = jax.grad(loss_hw, argnums=(0, 1))(src, fl)
    finally:
        mp._V3_INTERPRET = old
    out_ref = mp._warp_planes_ref(src, fl)
    ds_ref, df_ref = jax.grad(loss_ref, argnums=(0, 1))(src, fl)

    np.testing.assert_allclose(np.asarray(out_hw), np.asarray(out_ref), atol=2e-5)
    np.testing.assert_allclose(np.asarray(ds_hw), np.asarray(ds_ref), atol=3e-5)
    np.testing.assert_allclose(np.asarray(df_hw), np.asarray(df_ref), atol=3e-5)


def test_violations_guard():
    shape = (16, 16, 16)
    smooth = smooth_flow(shape, 1.5, 2)
    coords = base_grid(*shape, jnp.float32)[None] + smooth
    viol = warp_v3_window_violations(coords[..., 0], coords[..., 1], 16, 16)
    assert float(viol) == 0.0

    # alternating +-KD depth displacement exceeds the d spread budget
    wild = np.zeros((1, *shape, 3), np.float32)
    wild[:, :, ::2, :, 0] = KD
    wild[:, :, 1::2, :, 0] = -KD
    coords = base_grid(*shape, jnp.float32)[None] + jnp.asarray(wild)
    viol = warp_v3_window_violations(coords[..., 0], coords[..., 1], 16, 16)
    assert float(viol) > 0.5
