"""Model-level spatial sharding: D-sharded ModeT forward == unsharded model.

Runs on the 8-virtual-device CPU backend (conftest); exercises halo-exchange
convs, psum InstanceNorm, haloed neighborhood attention, cross-shard
trilinear upsampling and the all-gather warp end to end.
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from smilecode_tpu.models import ModeT
from smilecode_tpu.parallel.mesh import make_mesh
from smilecode_tpu.parallel.modet_sp import modet_forward_spatial

SHAPE = (32, 32, 32)


@pytest.fixture(scope="module")
def modet_setup():
    """Cheap shared setup: model + excited params only (no forward)."""
    model = ModeT(qk_scale=1.0)
    rng = np.random.default_rng(11)
    moving = jnp.asarray(rng.random((1, *SHAPE, 1), dtype=np.float64).astype(np.float32))
    fixed = jnp.asarray(rng.random((1, *SHAPE, 1), dtype=np.float64).astype(np.float32))
    params = jax.jit(model.init)(jax.random.PRNGKey(0), moving, fixed)
    # excite the zero-init projections/rpb so attention is non-trivial
    def excite(path, x):
        name = "/".join(str(k) for k in path)
        if "proj" in name or "rpb" in name:
            return x + jax.random.normal(jax.random.PRNGKey(len(name)), x.shape) * 0.1
        return x

    params = jax.tree_util.tree_map_with_path(
        lambda p, x: excite([getattr(k, "key", k) for k in p], x), params
    )
    return model, params, moving, fixed


@pytest.fixture(scope="module")
def modet_ref(modet_setup):
    """Reference forward for the equality test. jitted: eager flax apply
    dispatches op-by-op on CPU (~90 s for this fixture pre-jit)."""
    model, params, moving, fixed = modet_setup
    moved, flow = jax.jit(model.apply)(params, moving, fixed)
    return model, params, moving, fixed, np.asarray(moved), np.asarray(flow)


@pytest.mark.parametrize("n_spatial", [2])
@pytest.mark.slow
def test_sharded_equals_unsharded(modet_ref, n_spatial):
    model, params, moving, fixed, ref_moved, ref_flow = modet_ref
    mesh = make_mesh(dp=1, spatial=n_spatial)
    moved, flow = modet_forward_spatial(mesh, params, moving, fixed, qk_scale=1.0)
    assert float(jnp.abs(flow).max()) > 1e-3  # non-trivial field
    np.testing.assert_allclose(np.asarray(flow), ref_flow, atol=2e-4, rtol=1e-3)
    np.testing.assert_allclose(np.asarray(moved), ref_moved, atol=2e-4, rtol=1e-3)


def test_sharded_wrong_divisibility(modet_setup):
    model, params, moving, fixed = modet_setup
    mesh = make_mesh(dp=1, spatial=2)
    bad = jnp.zeros((1, 24, 32, 32, 1), jnp.float32)
    with pytest.raises(ValueError):
        modet_forward_spatial(mesh, params, bad, bad)
