"""Spatial (halo-exchange) parallelism tests on the 8-device CPU mesh."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from smilecode_tpu.parallel.mesh import make_mesh
from smilecode_tpu.parallel.spatial import (
    halo_exchange,
    make_sharded_conv,
    shard_spatial,
    spatial_map,
)

RNG = np.random.default_rng(12)


@pytest.fixture(scope="module")
def mesh():
    return make_mesh(dp=1, spatial=4)


def test_sharded_conv_matches_unsharded(mesh):
    x = jnp.asarray(RNG.standard_normal((2, 16, 8, 8, 3)).astype(np.float32))
    kernel = jnp.asarray(RNG.standard_normal((3, 3, 3, 3, 5)).astype(np.float32) * 0.1)
    bias = jnp.asarray(RNG.standard_normal((5,)).astype(np.float32))

    ref = jax.lax.conv_general_dilated(
        x, kernel, (1, 1, 1), [(1, 1)] * 3,
        dimension_numbers=("NDHWC", "DHWIO", "NDHWC"),
    ) + bias

    xs = shard_spatial(mesh, x)
    conv = jax.jit(make_sharded_conv(mesh, kernel, bias))
    out = conv(xs)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=1e-5, rtol=1e-5)


def test_two_layer_chain_per_layer_exchange(mesh):
    """Chained SAME convs + ReLU: exchange halos per layer (the correct
    pattern — a single deep halo would mismatch at the volume boundary)."""
    from smilecode_tpu.parallel.spatial import halo_conv

    x = jnp.asarray(RNG.standard_normal((1, 16, 6, 6, 2)).astype(np.float32))
    k1 = jnp.asarray(RNG.standard_normal((3, 3, 3, 2, 4)).astype(np.float32) * 0.1)
    k2 = jnp.asarray(RNG.standard_normal((3, 3, 3, 4, 4)).astype(np.float32) * 0.1)

    def chain(block):
        h = jnp.maximum(halo_conv(block, k1), 0)
        return halo_conv(h, k2)

    conv = lambda v, k: jax.lax.conv_general_dilated(
        v, k, (1, 1, 1), [(1, 1)] * 3, dimension_numbers=("NDHWC", "DHWIO", "NDHWC")
    )
    ref = conv(jnp.maximum(conv(x, k1), 0), k2)

    xs = shard_spatial(mesh, x)
    out = jax.jit(spatial_map(chain, 0, mesh))(xs)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=1e-5, rtol=1e-5)


def test_data_and_spatial_mesh():
    mesh = make_mesh(dp=2, spatial=4)
    assert mesh.shape == {"data": 2, "spatial": 4}
