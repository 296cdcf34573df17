"""Parity tests for core ops vs torch grid_sample / interpolate / conv semantics."""

import numpy as np
import pytest
import torch
import torch.nn.functional as F

import jax.numpy as jnp

from smilecode_tpu.ops.warp import warp, base_grid
from smilecode_tpu.ops.integrate import vecint
from smilecode_tpu.ops.resize import (
    interp_trilinear,
    upsample2_trilinear,
    resize_flow,
    avg_pool2,
    upsample2_nearest,
)
from tests.torch_ref import torch_warp, torch_vecint

RNG = np.random.default_rng(0)


def to_t(x_ndhwc):
    """channels-last numpy -> torch NCDHW tensor."""
    return torch.from_numpy(np.moveaxis(x_ndhwc, -1, 1).copy())


def from_t(t):
    """torch NCDHW -> channels-last numpy."""
    return np.moveaxis(t.detach().numpy(), 1, -1)


class TestWarp:
    def test_identity_flow(self):
        src = RNG.standard_normal((2, 8, 9, 10, 3)).astype(np.float32)
        flow = np.zeros((2, 8, 9, 10, 3), np.float32)
        out = np.asarray(warp(jnp.asarray(src), jnp.asarray(flow)))
        np.testing.assert_allclose(out, src, atol=1e-5)

    def test_integer_shift(self):
        src = RNG.standard_normal((1, 6, 6, 6, 1)).astype(np.float32)
        flow = np.zeros((1, 6, 6, 6, 3), np.float32)
        flow[..., 0] = 1.0  # sample at d+1 => out[d] = src[d+1]
        out = np.asarray(warp(jnp.asarray(src), jnp.asarray(flow)))
        np.testing.assert_allclose(out[:, :-1], src[:, 1:], atol=1e-5)
        np.testing.assert_allclose(out[:, -1], 0.0, atol=1e-6)  # zero padding

    @pytest.mark.parametrize("mode", ["bilinear", "nearest"])
    def test_vs_torch_random(self, mode):
        src = RNG.standard_normal((2, 7, 8, 9, 2)).astype(np.float32)
        flow = (RNG.standard_normal((2, 7, 8, 9, 3)) * 2.5).astype(np.float32)
        ours = np.asarray(warp(jnp.asarray(src), jnp.asarray(flow), mode=mode))
        ref = from_t(torch_warp(to_t(src), to_t(flow), mode=mode))
        np.testing.assert_allclose(ours, ref, atol=2e-5, rtol=1e-5)

    def test_vs_torch_large_displacement(self):
        src = RNG.standard_normal((1, 10, 12, 10, 1)).astype(np.float32)
        flow = (RNG.standard_normal((1, 10, 12, 10, 3)) * 20).astype(np.float32)
        ours = np.asarray(warp(jnp.asarray(src), jnp.asarray(flow)))
        ref = from_t(torch_warp(to_t(src), to_t(flow)))
        np.testing.assert_allclose(ours, ref, atol=2e-5, rtol=1e-5)

    def test_grad_flows(self):
        import jax

        src = jnp.asarray(RNG.standard_normal((1, 5, 5, 5, 1)).astype(np.float32))
        flow = jnp.asarray(RNG.standard_normal((1, 5, 5, 5, 3)).astype(np.float32) * 0.3)
        g = jax.grad(lambda f: jnp.sum(warp(src, f) ** 2))(flow)
        assert np.isfinite(np.asarray(g)).all()
        assert float(jnp.max(jnp.abs(g))) > 0


class TestVecInt:
    def test_vs_torch(self):
        vec = (RNG.standard_normal((1, 8, 9, 10, 3)) * 3).astype(np.float32)
        ours = np.asarray(vecint(jnp.asarray(vec), nsteps=7))
        ref = from_t(torch_vecint(to_t(vec), nsteps=7))
        np.testing.assert_allclose(ours, ref, atol=5e-5, rtol=1e-4)

    def test_zero_field(self):
        vec = np.zeros((1, 4, 4, 4, 3), np.float32)
        out = np.asarray(vecint(jnp.asarray(vec)))
        np.testing.assert_allclose(out, 0.0)


class TestResize:
    @pytest.mark.parametrize("scale", [2.0, 0.5])
    def test_interp_vs_torch(self, scale):
        x = RNG.standard_normal((2, 6, 8, 10, 3)).astype(np.float32)
        out_shape = tuple(int(s * scale) for s in (6, 8, 10))
        ours = np.asarray(interp_trilinear(jnp.asarray(x), out_shape))
        ref = from_t(
            F.interpolate(to_t(x), scale_factor=scale, mode="trilinear", align_corners=True)
        )
        np.testing.assert_allclose(ours, ref, atol=2e-5, rtol=1e-5)

    @pytest.mark.parametrize("factor", [0.5, 2.0])
    def test_resize_flow_vs_torch(self, factor):
        x = (RNG.standard_normal((1, 8, 8, 8, 3)) * 4).astype(np.float32)
        ours = np.asarray(resize_flow(jnp.asarray(x), factor))
        xt = to_t(x)
        if factor < 1:
            ref = F.interpolate(xt, scale_factor=factor, mode="trilinear", align_corners=True) * factor
        else:
            ref = F.interpolate(xt * factor, scale_factor=factor, mode="trilinear", align_corners=True)
        np.testing.assert_allclose(ours, from_t(ref), atol=2e-5, rtol=1e-5)

    def test_upsample2(self):
        x = RNG.standard_normal((1, 5, 6, 7, 2)).astype(np.float32)
        ours = np.asarray(upsample2_trilinear(jnp.asarray(x)))
        ref = from_t(F.interpolate(to_t(x), scale_factor=2, mode="trilinear", align_corners=True))
        np.testing.assert_allclose(ours, ref, atol=2e-5, rtol=1e-5)

    def test_upsample2_nearest(self):
        x = RNG.standard_normal((1, 3, 4, 5, 2)).astype(np.float32)
        ours = np.asarray(upsample2_nearest(jnp.asarray(x)))
        ref = from_t(F.interpolate(to_t(x), scale_factor=2, mode="nearest"))
        np.testing.assert_allclose(ours, ref, atol=0)

    def test_avg_pool(self):
        x = RNG.standard_normal((2, 8, 8, 8, 4)).astype(np.float32)
        ours = np.asarray(avg_pool2(jnp.asarray(x)))
        ref = from_t(F.avg_pool3d(to_t(x), 2))
        np.testing.assert_allclose(ours, ref, atol=2e-6, rtol=1e-5)


class TestGrid:
    def test_base_grid(self):
        g = np.asarray(base_grid(2, 3, 4))
        assert g.shape == (2, 3, 4, 3)
        assert g[1, 2, 3].tolist() == [1.0, 2.0, 3.0]


class TestWarpPacked:
    """The packed row-gather fast path must match the simple oracle."""

    @pytest.mark.parametrize("c", [1, 3, 8, 20])
    def test_matches_simple(self, c):
        from smilecode_tpu.ops.warp import _warp_simple

        src = RNG.standard_normal((2, 7, 8, 9, c)).astype(np.float32)
        flow = (RNG.standard_normal((2, 7, 8, 9, 3)) * 3).astype(np.float32)
        fast = np.asarray(warp(jnp.asarray(src), jnp.asarray(flow), impl="packed"))
        ref = np.asarray(_warp_simple(jnp.asarray(src), jnp.asarray(flow)))
        np.testing.assert_allclose(fast, ref, atol=1e-5, rtol=1e-5)

    def test_mismatched_shapes(self):
        from smilecode_tpu.ops.warp import _warp_simple

        src = RNG.standard_normal((1, 6, 6, 6, 2)).astype(np.float32)
        flow = (RNG.standard_normal((1, 12, 12, 12, 3)) * 2).astype(np.float32)
        fast = np.asarray(warp(jnp.asarray(src), jnp.asarray(flow), impl="packed"))
        ref = np.asarray(_warp_simple(jnp.asarray(src), jnp.asarray(flow)))
        assert fast.shape == (1, 12, 12, 12, 2)
        np.testing.assert_allclose(fast, ref, atol=1e-5, rtol=1e-5)

    def test_far_oob(self):
        src = np.ones((1, 5, 5, 5, 1), np.float32)
        flow = np.full((1, 5, 5, 5, 3), 50.0, np.float32)
        out = np.asarray(warp(jnp.asarray(src), jnp.asarray(flow), impl="packed"))
        np.testing.assert_allclose(out, 0.0)

    def test_grad_matches_simple(self):
        import jax

        from smilecode_tpu.ops.warp import _warp_simple

        src = jnp.asarray(RNG.standard_normal((1, 5, 6, 5, 2)).astype(np.float32))
        flow = jnp.asarray((RNG.standard_normal((1, 5, 6, 5, 3)) * 0.7).astype(np.float32))
        g1 = jax.grad(lambda f: jnp.sum(warp(src, f, impl="packed") ** 2))(flow)
        g2 = jax.grad(lambda f: jnp.sum(_warp_simple(src, f) ** 2))(flow)
        np.testing.assert_allclose(np.asarray(g1), np.asarray(g2), atol=1e-4, rtol=1e-4)


class TestConvS2D:
    """Space-to-depth conv must equal the direct SAME conv."""

    @pytest.mark.parametrize("cin,cout", [(1, 4), (8, 8), (3, 6)])
    def test_matches_direct(self, cin, cout):
        import jax

        from smilecode_tpu.ops.conv_s2d import conv3d_s2d

        x = jnp.asarray(RNG.standard_normal((2, 8, 10, 12, cin)).astype(np.float32))
        k = jnp.asarray(RNG.standard_normal((3, 3, 3, cin, cout)).astype(np.float32) * 0.2)
        b = jnp.asarray(RNG.standard_normal((cout,)).astype(np.float32))
        ref = jax.lax.conv_general_dilated(
            x, k, (1, 1, 1), [(1, 1)] * 3,
            dimension_numbers=("NDHWC", "DHWIO", "NDHWC"),
        ) + b
        out = conv3d_s2d(x, k, b)
        np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=1e-4, rtol=1e-4)
