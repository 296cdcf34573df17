"""Windowed Pallas warp kernel vs the exact oracle (interpret mode on CPU).

On the real chip the kernel matched the oracle to ~1e-6 on within-window
flows and its violation metric correctly flagged the clamped cases
(round-1 on-chip validation).
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from smilecode_tpu.kernels.warp3d import warp3d_pallas, warp_window_violations
from smilecode_tpu.ops.warp import _warp_simple, warp

RNG = np.random.default_rng(21)


def smooth_flow(shape, mag, kpts):
    from smilecode_tpu.ops.resize import interp_trilinear

    coarse = RNG.standard_normal((1, kpts, kpts, kpts, 3)).astype(np.float32) * mag
    return jnp.asarray(interp_trilinear(jnp.asarray(coarse), shape))


@pytest.mark.parametrize(
    "shape,c,mag",
    [((16, 16, 16), 1, 0.8), ((16, 24, 16), 3, 2.0), ((24, 16, 16), 2, 3.0)],
)
def test_matches_oracle_within_window(shape, c, mag):
    src = jnp.asarray(RNG.standard_normal((1, *shape, c)).astype(np.float32))
    fl = smooth_flow(shape, mag, 2)
    assert float(warp_window_violations(fl, shape)) == 0.0
    out = warp3d_pallas(src, fl, True)  # interpret
    ref = _warp_simple(src, fl)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=1e-5, rtol=1e-5)


def test_oob_zeros():
    src = jnp.ones((1, 16, 16, 16, 1))
    fl = jnp.full((1, 16, 16, 16, 3), 40.0)
    out = warp3d_pallas(src, fl, True)
    np.testing.assert_allclose(np.asarray(out), 0.0)


def test_violation_metric_flags_wild_flows():
    fl = smooth_flow((32, 32, 32), 20.0, 5)
    assert float(warp_window_violations(fl, (32, 32, 32))) > 0.0


def test_warp_dispatch_pallas():
    src = jnp.asarray(RNG.standard_normal((1, 16, 16, 16, 1)).astype(np.float32))
    fl = smooth_flow((16, 16, 16), 0.5, 2)
    out = warp(src, fl, impl="pallas")
    ref = warp(src, fl, impl="packed")
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=1e-5, rtol=1e-5)


@pytest.mark.slow  # ~12 s interpret grad of the legacy v1 windowed kernel
def test_grad_via_custom_vjp():
    src = jnp.asarray(RNG.standard_normal((1, 8, 8, 8, 1)).astype(np.float32))
    fl = smooth_flow((8, 8, 8), 0.4, 2)
    g1 = jax.grad(lambda f: jnp.sum(warp3d_pallas(src, f, True) ** 2))(fl)
    g2 = jax.grad(lambda f: jnp.sum(_warp_simple(src, f) ** 2))(fl)
    np.testing.assert_allclose(np.asarray(g1), np.asarray(g2), atol=1e-4, rtol=1e-3)


def test_guarded_smooth_uses_kernel_and_matches():
    """Smooth flow (no violations) -> guarded == windowed == oracle."""
    from smilecode_tpu.kernels.warp3d import warp3d_guarded

    src = jnp.asarray(RNG.standard_normal((1, 16, 16, 16, 2)).astype(np.float32))
    flow = smooth_flow((16, 16, 16), 2.0, 4)
    assert float(warp_window_violations(flow)) == 0.0
    out = warp3d_guarded(src, flow, True)
    ref = _warp_simple(src, flow)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=1e-5, rtol=1e-4)


def test_guarded_wild_flow_falls_back_exact():
    """Wild flow (tiles would clamp) -> guarded falls back to packed = exact."""
    from smilecode_tpu.kernels.warp3d import warp3d_guarded

    src = jnp.asarray(RNG.standard_normal((1, 16, 16, 16, 1)).astype(np.float32))
    flow = jnp.asarray((RNG.standard_normal((1, 16, 16, 16, 3)) * 30).astype(np.float32))
    assert float(warp_window_violations(flow)) > 0.0
    out = jax.jit(lambda s, f: warp3d_guarded(s, f, True))(src, flow)
    ref = _warp_simple(src, flow)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=1e-5, rtol=1e-4)


def test_warp_dispatch_guarded():
    src = jnp.asarray(RNG.standard_normal((1, 16, 16, 16, 1)).astype(np.float32))
    flow = smooth_flow((16, 16, 16), 1.5, 4)
    out = warp(src, flow, impl="guarded")
    ref = warp(src, flow, impl="simple")
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=1e-5, rtol=1e-4)
