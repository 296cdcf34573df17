"""s2d-resident encoder == flax Encoder (same params, same outputs)."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from smilecode_tpu.models.modet import Encoder
from smilecode_tpu.ops.encoder_s2d import (
    conv3_s2d,
    encoder_s2d_apply,
    encoder_s2d_planes_apply,
    pool_s2d,
    s2d,
    s2d_from_planes,
    und2d,
    und2d_to_planes,
)

RNG = np.random.default_rng(17)


def test_s2d_roundtrip():
    x = jnp.asarray(RNG.standard_normal((2, 8, 12, 8, 5)).astype(np.float32))
    assert np.array_equal(np.asarray(und2d(s2d(x), 5)), np.asarray(x))


def test_planes_layout_helpers():
    x = jnp.asarray(RNG.standard_normal((2, 8, 12, 8, 5)).astype(np.float32))
    xp = x.transpose(0, 4, 1, 2, 3)
    assert np.array_equal(np.asarray(s2d_from_planes(xp)), np.asarray(s2d(x)))
    assert np.array_equal(
        np.asarray(und2d_to_planes(s2d(x), 5)),
        np.asarray(und2d(s2d(x), 5).transpose(0, 4, 1, 2, 3)),
    )
    from smilecode_tpu.ops.encoder_s2d import avg_pool2_s2d

    xs = s2d(x)
    np.testing.assert_allclose(
        np.asarray(pool_s2d(xs, 5)),
        np.asarray(s2d(avg_pool2_s2d(xs, 5))),
        atol=1e-6,
    )


def test_conv3_s2d_matches_direct():
    x = jnp.asarray(RNG.standard_normal((1, 8, 12, 8, 4)).astype(np.float32))
    kern = jnp.asarray(RNG.standard_normal((3, 3, 3, 4, 6)).astype(np.float32) * 0.2)
    bias = jnp.asarray(RNG.standard_normal((6,)).astype(np.float32))
    ref = jax.lax.conv_general_dilated(
        x, kern, (1, 1, 1), [(1, 1)] * 3, dimension_numbers=("NDHWC", "DHWIO", "NDHWC")
    ) + bias
    out = und2d(conv3_s2d(s2d(x), kern, bias), 6)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=2e-5, rtol=1e-4)


def test_encoder_s2d_equals_flax():
    shape = (32, 32, 32)
    enc = Encoder(first_out_channel=4)
    x = jnp.asarray(RNG.random((1, *shape, 1), dtype=np.float64).astype(np.float32))
    params = jax.jit(enc.init)(jax.random.PRNGKey(0), x)
    refs = enc.apply(params, x)
    outs = encoder_s2d_apply(params["params"], x, first_out_channel=4)
    assert len(outs) == 5
    for i, (o, r) in enumerate(zip(outs, refs)):
        assert o.shape == r.shape, (i, o.shape, r.shape)
        np.testing.assert_allclose(
            np.asarray(o), np.asarray(r), atol=2e-5, rtol=1e-4, err_msg=f"level {i}"
        )

    planes_outs = encoder_s2d_planes_apply(
        params["params"], jnp.moveaxis(x, -1, 1), first_out_channel=4
    )
    for i, (o, r) in enumerate(zip(planes_outs, refs)):
        np.testing.assert_allclose(
            np.asarray(jnp.moveaxis(o, 1, -1)), np.asarray(r),
            atol=2e-5, rtol=1e-4, err_msg=f"planes level {i}",
        )
