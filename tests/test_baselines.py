"""Shape/finiteness tests for the baseline model family."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

pytestmark = pytest.mark.slow  # full-model CPU compiles, multi-minute

RNG = np.random.default_rng(6)


def _pair(shape):
    m = jnp.asarray(RNG.random((1, *shape, 1), dtype=np.float64).astype(np.float32))
    f = jnp.asarray(RNG.random((1, *shape, 1), dtype=np.float64).astype(np.float32))
    return m, f


def _run(model, shape):
    m, f = _pair(shape)
    params = jax.jit(model.init)(jax.random.PRNGKey(0), m, f)
    outs = model.apply(params, m, f)
    moved, flow = outs[0], outs[1]
    assert moved.shape == (1, *shape, 1)
    assert flow.shape == (1, *shape, 3)
    for o in outs:
        assert np.isfinite(np.asarray(o)).all()
    return outs, params


def test_im2grid():
    from smilecode_tpu.models import Im2grid

    outs, params = _run(Im2grid(), (32, 32, 32))
    assert "peblock5" in params["params"]
    assert params["params"]["peblock5"]["alpha"].shape == (1,)


def test_pcnet():
    from smilecode_tpu.models import PCNet

    outs, params = _run(PCNet(), (16, 16, 16))
    assert "encoder_float" in params["params"]
    assert "encoder_fixed" in params["params"]
    assert "nff_0" in params["params"]


def test_prnet():
    from smilecode_tpu.models import PRNet

    outs, params = _run(PRNet(), (16, 16, 16))
    # N(0,1e-5)-init flow conv
    k = params["params"]["prblock1"]["flow"]["kernel"]
    assert float(jnp.abs(k).max()) < 1e-3


def test_prnetplusplus():
    from smilecode_tpu.models import PRNetPlusPlus

    _run(PRNetPlusPlus(), (16, 16, 16))


def test_correlation3d_identity_peak():
    from smilecode_tpu.models.prnet import correlation3d

    x = jnp.asarray(RNG.random((1, 8, 8, 8, 4), dtype=np.float64).astype(np.float32))
    corr = correlation3d(x, x)
    assert corr.shape == (1, 8, 8, 8, 27)
    assert np.isfinite(np.asarray(corr)).all()


def test_vtn():
    from smilecode_tpu.models import VTN

    _run(VTN(), (64, 64, 64))


def test_rcn_cascade():
    from smilecode_tpu.models import RCN

    outs, _ = _run(RCN(n_cascade=2), (64, 64, 64))
    assert len(outs) == 2 + 2  # moved, flow, 2 subflows
    from smilecode_tpu.models import RCN as RCN2

    model = RCN2(n_cascade=2, return_aux=False)


def test_rdn_variants():
    from smilecode_tpu.models import RDN

    shape = (16, 16, 16)
    outs, params = _run(RDN(stages=2, levels=(1, 1, 1, 2), share_weights=True), shape)
    assert len(outs) == 2 + 2  # moved, flow, 2 stage flows
    assert "est3" in params["params"]

    outs2, params2 = _run(
        RDN(stages=2, levels=(1, 1, 1, 1), share_weights=False, diff=True), shape
    )
    assert "est3_0" in params2["params"] and "est3_1" in params2["params"]

    outs3, _ = _run(RDN(stages=1, return_aux=False), shape)
    assert len(outs3) == 2
