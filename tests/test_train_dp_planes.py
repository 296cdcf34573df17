"""DP x planes fast path: the shard_map train step must match the
single-device planes step (same params, same batch) — VERDICT r2 weak #4:
"SURVEY §2.5's promise was sharding for *the* model, not for the slow twin".

The planes attention is monkeypatched to an XLA-oracle adapter with the
same planes contract: on CPU the fused Pallas kernels (fwd + B1/B2 bwd)
only run in interpret mode, which made this test the slowest in the suite
(~400 s) while adding no kernel coverage (tests/test_pallas_attn.py owns
kernel-vs-oracle equality, including planes-layout grads). Both the
single-device and the shard_map step use the same patched forward, so the
DP-equality property under test is unchanged.
"""

import jax
import jax.numpy as jnp
import numpy as np
import optax
import pytest

from smilecode_tpu.config import TrainConfig
from smilecode_tpu.models.registry import build_model
from smilecode_tpu.models import modet_planes as MP
from smilecode_tpu.ops.attention import _neighborhood_attention_xla
from smilecode_tpu.parallel.mesh import make_mesh, replicate, shard_batch
from smilecode_tpu.train import make_train_step


def _oracle_attention_planes(qs, kplanes, rpb, heads, scale=1.0, interpret=False):
    """XLA-oracle twin of `modet_attention_planes_diff` (same planes
    contract: (B*heads, D, hd, H, W) in -> (B*heads, 3, D, H, W) out)."""
    bh, d, hd, h, w = qs.shape
    b = bh // heads

    def to_ndhwc(x):
        return x.reshape(b, heads, d, hd, h, w).transpose(0, 2, 4, 5, 1, 3)

    out = _neighborhood_attention_xla(to_ndhwc(qs), to_ndhwc(kplanes), rpb, scale)
    out = out.reshape(b, d, h, w, heads, 3).transpose(0, 4, 5, 1, 2, 3)
    return out.reshape(bh, 3, d, h, w)


def _tiny_setup():
    cfg = TrainConfig(channels=2, head_dim=2, num_heads=(2, 2, 1, 1, 1))
    spec = build_model("modet", cfg)
    shape = (32, 32, 32)
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.random((2, *shape, 1), np.float32))
    y = jnp.asarray(rng.random((2, *shape, 1), np.float32))
    dummy = jnp.zeros((1, *shape, 1), jnp.float32)
    params = jax.jit(spec.module.init)(jax.random.PRNGKey(0), dummy, dummy)
    return spec, params, x, y


@pytest.mark.slow
def test_dp_planes_step_matches_single_device(monkeypatch):
    # slow: ~50 s of full-model fwd+bwd compiles; the DP x planes step also
    # executes under the driver as dryrun stage 4 every round.
    monkeypatch.setattr(MP, "modet_attention_planes_diff", _oracle_attention_planes)
    spec, params, x, y = _tiny_setup()
    # sgd: params' diff = lr * grads' diff, so this asserts GRADIENT equality
    # directly; adam-family steps amplify ~1e-7 pmean reorderings to ~30% of
    # an update wherever sqrt(v) ~ eps (observed 3e-5 vs lr=1e-4)
    tx = optax.sgd(1e-2)

    # single-device fast-path step
    step1 = make_train_step(spec, tx, [1.0, 1.0], use_fast=True)
    p1, _, loss1, lv1 = step1(
        jax.tree.map(jnp.copy, params), tx.init(params), x, y
    )

    # 2-way DP over a data mesh, planes graph per shard via shard_map
    mesh = make_mesh(dp=2)
    assert mesh is not None, "conftest provides 8 virtual devices"
    stepN = make_train_step(spec, tx, [1.0, 1.0], use_fast=True, mesh=mesh)
    pN, _, lossN, lvN = stepN(
        replicate(mesh, jax.tree.map(jnp.copy, params)),
        replicate(mesh, tx.init(params)),
        *shard_batch(mesh, (x, y)),
    )

    # pmean-of-local-means reorders the batch reduction vs the global mean:
    # bitwise equality is not expected, only float32-accumulation closeness
    np.testing.assert_allclose(float(lossN), float(loss1), rtol=5e-5)
    for a, b in zip(lvN, lv1):
        np.testing.assert_allclose(float(a), float(b), rtol=5e-5, atol=1e-7)
    errs = jax.tree.map(
        lambda a, b: float(jnp.max(jnp.abs(a - b))), pN, p1
    )
    assert max(jax.tree.leaves(errs)) < 1e-5, errs
