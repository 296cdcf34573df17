"""Parity tests for losses and metrics vs torch/numpy references."""

import numpy as np
import torch

import jax.numpy as jnp

from smilecode_tpu.losses import ncc_vxm, grad3d
from smilecode_tpu.metrics import (
    dice_val_voi,
    dice_val_voi_np,
    jacobian_determinant,
    fold_fraction,
)
from tests.torch_ref import torch_ncc, torch_grad3d

RNG = np.random.default_rng(1)


def to_t(x):
    return torch.from_numpy(np.moveaxis(x, -1, 1).copy())


class TestNCC:
    def test_vs_torch(self):
        a = RNG.random((1, 12, 14, 12, 1)).astype(np.float32)
        b = RNG.random((1, 12, 14, 12, 1)).astype(np.float32)
        ours = float(ncc_vxm(jnp.asarray(a), jnp.asarray(b)))
        ref = float(torch_ncc(to_t(a), to_t(b)))
        np.testing.assert_allclose(ours, ref, atol=1e-4, rtol=1e-4)

    def test_identical_images_near_minus_one(self):
        a = RNG.random((1, 16, 16, 16, 1)).astype(np.float32)
        val = float(ncc_vxm(jnp.asarray(a), jnp.asarray(a)))
        assert val < -0.95

    def test_symmetric(self):
        a = RNG.random((1, 10, 10, 10, 1)).astype(np.float32)
        b = RNG.random((1, 10, 10, 10, 1)).astype(np.float32)
        v1 = float(ncc_vxm(jnp.asarray(a), jnp.asarray(b)))
        v2 = float(ncc_vxm(jnp.asarray(b), jnp.asarray(a)))
        np.testing.assert_allclose(v1, v2, atol=1e-6)


class TestGrad3d:
    def test_vs_torch(self):
        f = (RNG.standard_normal((1, 8, 9, 10, 3)) * 2).astype(np.float32)
        for pen in ("l1", "l2"):
            ours = float(grad3d(jnp.asarray(f), penalty=pen))
            ref = float(torch_grad3d(to_t(f), penalty=pen))
            np.testing.assert_allclose(ours, ref, atol=1e-6, rtol=1e-5)

    def test_linear_ramp(self):
        # constant-gradient field: l2 of unit forward differences along d only
        d, h, w = 6, 6, 6
        f = np.zeros((1, d, h, w, 3), np.float32)
        f[..., 0] = np.arange(d, dtype=np.float32)[None, :, None, None]
        val = float(grad3d(jnp.asarray(f), penalty="l2"))
        # dd diff = 1 on one of three channels => mean over channel axis too
        np.testing.assert_allclose(val, (1.0 / 3.0) / 3.0, atol=1e-6)


class TestDice:
    def test_jnp_vs_np(self):
        pred = RNG.integers(0, 55, (32, 32, 32)).astype(np.int32)
        true = RNG.integers(0, 55, (32, 32, 32)).astype(np.int32)
        a = float(dice_val_voi(jnp.asarray(pred), jnp.asarray(true)))
        b = dice_val_voi_np(pred, true)
        np.testing.assert_allclose(a, b, atol=1e-5)

    def test_perfect_overlap(self):
        seg = RNG.integers(1, 55, (16, 16, 16)).astype(np.int32)
        val = float(dice_val_voi(jnp.asarray(seg), jnp.asarray(seg)))
        assert val > 0.999


class TestJacobian:
    def test_identity_flow_det_one(self):
        disp = np.zeros((8, 9, 10, 3), np.float32)
        det = np.asarray(jacobian_determinant(jnp.asarray(disp)))
        np.testing.assert_allclose(det, 1.0, atol=1e-5)
        assert float(fold_fraction(jnp.asarray(disp))) == 0.0

    def test_vs_np_gradient(self):
        disp = (RNG.standard_normal((8, 9, 10, 3)) * 0.5).astype(np.float32)
        det = np.asarray(jacobian_determinant(jnp.asarray(disp)))
        # numpy reference: np.gradient of disp + identity grid
        grid = np.stack(
            np.meshgrid(np.arange(8), np.arange(9), np.arange(10), indexing="ij"), -1
        ).astype(np.float32)
        phi = disp + grid
        J = np.gradient(phi, axis=(0, 1, 2))
        dx, dy, dz = J
        ref = (
            dx[..., 0] * (dy[..., 1] * dz[..., 2] - dy[..., 2] * dz[..., 1])
            - dx[..., 1] * (dy[..., 0] * dz[..., 2] - dy[..., 2] * dz[..., 0])
            + dx[..., 2] * (dy[..., 0] * dz[..., 1] - dy[..., 1] * dz[..., 0])
        )
        np.testing.assert_allclose(det, ref, atol=1e-4, rtol=1e-4)

    def test_folding_detected(self):
        # strong negative gradient along d flips orientation somewhere
        d, h, w = 8, 8, 8
        disp = np.zeros((d, h, w, 3), np.float32)
        disp[..., 0] = -2.0 * np.arange(d)[:, None, None]
        frac = float(fold_fraction(jnp.asarray(disp)))
        assert frac > 0.9
