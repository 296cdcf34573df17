"""ModeT model tests: shapes, determinism, gradient flow, training step."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from smilecode_tpu.models import ModeT

RNG = np.random.default_rng(3)
SHAPE = (32, 32, 32)  # divisible by 16 (encoder has 4 avg-pool halvings)


@pytest.fixture(scope="module")
def model_and_params():
    model = ModeT(qk_scale=1.0)
    moving = jnp.asarray(RNG.random((1, *SHAPE, 1), dtype=np.float64).astype(np.float32))
    fixed = jnp.asarray(RNG.random((1, *SHAPE, 1), dtype=np.float64).astype(np.float32))
    params = model.init(jax.random.PRNGKey(0), moving, fixed)
    return model, params, moving, fixed


def test_output_shapes(model_and_params):
    model, params, moving, fixed = model_and_params
    moved, flow = model.apply(params, moving, fixed)
    assert moved.shape == (1, *SHAPE, 1)
    assert flow.shape == (1, *SHAPE, 3)
    assert np.isfinite(np.asarray(moved)).all()
    assert np.isfinite(np.asarray(flow)).all()


def test_param_structure(model_and_params):
    model, params, *_ = model_and_params
    p = params["params"]
    # shared encoder called on both volumes -> single param set
    assert "encoder" in p
    for name in ["projblock1", "projblock2", "projblock3", "projblock4", "projblock5",
                 "mdt1", "mdt2", "mdt3", "mdt4", "mdt5", "cwm3", "cwm4", "cwm5"]:
        assert name in p, name
    assert p["mdt5"]["rpb"].shape == (8, 3, 3, 3)
    assert p["mdt1"]["rpb"].shape == (1, 3, 3, 3)
    # zero-init projections mean initial flow is tiny (near-uniform attention)
    assert float(jnp.abs(p["projblock5"]["proj"]["kernel"]).max()) < 1e-3


def test_initial_flow_small(model_and_params):
    # with N(0,1e-5) projections and zero rpb, attention is ~uniform =>
    # subfields ~0 => initial flow magnitude should be small
    model, params, moving, fixed = model_and_params
    _, flow = model.apply(params, moving, fixed)
    assert float(jnp.abs(flow).max()) < 1.0


def test_train_loss_decreases(model_and_params):
    import optax

    from smilecode_tpu.losses import ncc_vxm, grad3d

    model, params, _, _ = model_and_params
    # synthetic blob pair with a real offset to register
    g = np.stack(np.meshgrid(*[np.arange(s) for s in SHAPE], indexing="ij"), -1)
    blob = lambda c: np.exp(
        -np.sum((g - np.asarray(c)) ** 2, -1) / (2 * 5.0 ** 2)
    ).astype(np.float32)
    moving = jnp.asarray(blob([18, 16, 16])[None, ..., None])
    fixed = jnp.asarray(blob([14, 16, 16])[None, ..., None])

    tx = optax.adam(1e-3)
    opt_state = tx.init(params)

    @jax.jit
    def step(params, opt_state):
        def loss_fn(p):
            moved, flow = model.apply(p, moving, fixed)
            return ncc_vxm(moved, fixed) + grad3d(flow, penalty="l2")

        loss, grads = jax.value_and_grad(loss_fn)(params)
        updates, opt_state = tx.update(grads, opt_state)
        return optax.apply_updates(params, updates), opt_state, loss

    losses = []
    p = params
    for _ in range(8):
        p, opt_state, loss = step(p, opt_state)
        losses.append(float(loss))
    # Adam has a small transient after step 0; judge the trend, not step 1
    assert losses[-1] < losses[0], losses
    assert min(losses[-3:]) == min(losses), losses
    assert np.isfinite(losses).all()
