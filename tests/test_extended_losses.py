"""Parity tests for the RCN/RDN extended loss zoo vs torch oracles."""

import numpy as np
import torch

import jax.numpy as jnp

from smilecode_tpu.losses import (
    ssim3d,
    ssim3d_loss,
    grad2d,
    grad3d_itv,
    displacement_regularizer,
    mind_ssc,
    mind_loss,
    mutual_information,
    local_mutual_information,
)
from tests.torch_ref import (
    torch_ssim3d,
    torch_displacement_regularizer,
    torch_mind_ssc,
    torch_mutual_information,
)

RNG = np.random.default_rng(7)


def to_t(x):
    return torch.from_numpy(np.moveaxis(x, -1, 1).copy())


def test_ssim3d():
    a = RNG.random((1, 12, 12, 12, 1)).astype(np.float32)
    b = RNG.random((1, 12, 12, 12, 1)).astype(np.float32)
    ours = float(ssim3d(jnp.asarray(a), jnp.asarray(b)))
    ref = float(torch_ssim3d(to_t(a), to_t(b)))
    np.testing.assert_allclose(ours, ref, atol=1e-5, rtol=1e-4)
    assert abs(float(ssim3d_loss(jnp.asarray(a), jnp.asarray(a)))) < 1e-4


def test_displacement_regularizer():
    disp = (RNG.standard_normal((1, 8, 9, 8, 3)) * 2).astype(np.float32)
    for et in ("gradient-l2", "gradient-l1", "bending"):
        ours = float(displacement_regularizer(jnp.asarray(disp), et))
        ref = float(torch_displacement_regularizer(to_t(disp), et))
        np.testing.assert_allclose(ours, ref, atol=1e-5, rtol=1e-4)


def test_grad3d_itv_ramp():
    f = np.zeros((1, 6, 6, 6, 3), np.float32)
    f[..., 0] = np.arange(6, dtype=np.float32)[None, :, None, None]
    val = float(grad3d_itv(jnp.asarray(f)))
    # channel 0 has |dd|=1, channels 1-2 are flat -> sqrt(eps)
    expected = (np.sqrt(1 + 1e-6) + 2 * np.sqrt(1e-6)) / 3.0 / 3.0
    np.testing.assert_allclose(val, expected, rtol=1e-5)


def test_grad2d():
    f = (RNG.standard_normal((1, 8, 8, 2))).astype(np.float32)
    v1 = float(grad2d(jnp.asarray(f), "l2"))
    ft = torch.from_numpy(np.moveaxis(f, -1, 1).copy())
    dy = (ft[:, :, 1:] - ft[:, :, :-1]) ** 2
    dx = (ft[:, :, :, 1:] - ft[:, :, :, :-1]) ** 2
    ref = float((dx.mean() + dy.mean()) / 2)
    np.testing.assert_allclose(v1, ref, atol=1e-6)


def test_mind_ssc_and_loss():
    a = RNG.random((1, 10, 10, 10, 1)).astype(np.float32)
    b = RNG.random((1, 10, 10, 10, 1)).astype(np.float32)
    ours_desc = np.asarray(mind_ssc(jnp.asarray(a)))
    ref_desc = np.moveaxis(torch_mind_ssc(to_t(a)).numpy(), 1, -1)
    np.testing.assert_allclose(ours_desc, ref_desc, atol=1e-4, rtol=1e-3)
    ours = float(mind_loss(jnp.asarray(a), jnp.asarray(b)))
    ref = float(torch.mean((torch_mind_ssc(to_t(a)) - torch_mind_ssc(to_t(b))) ** 2))
    np.testing.assert_allclose(ours, ref, atol=1e-5, rtol=1e-3)


def test_mutual_information():
    a = RNG.random((1, 10, 10, 10, 1)).astype(np.float32)
    b = (0.7 * a + 0.3 * RNG.random((1, 10, 10, 10, 1))).astype(np.float32)
    ours = float(mutual_information(jnp.asarray(a), jnp.asarray(b)))
    ref = float(torch_mutual_information(to_t(a), to_t(b)))
    np.testing.assert_allclose(ours, ref, atol=1e-4, rtol=1e-3)
    # identical images carry more MI than unrelated ones
    mi_self = -float(mutual_information(jnp.asarray(a), jnp.asarray(a)))
    assert mi_self > -ours


def test_local_mutual_information():
    a = RNG.random((1, 10, 10, 10, 1)).astype(np.float32)
    v = float(local_mutual_information(jnp.asarray(a), jnp.asarray(a)))
    b = RNG.random((1, 10, 10, 10, 1)).astype(np.float32)
    v2 = float(local_mutual_information(jnp.asarray(a), jnp.asarray(b)))
    assert np.isfinite(v) and np.isfinite(v2)
    assert v < v2  # self MI is larger => more negative loss
