"""Pallas fused attention kernel vs the XLA oracle (interpret mode on CPU).

On the real TPU the compiled kernel matches a float64 numpy reference to
~1e-6 (verified on-chip in round 1); here the interpreter validates the same
kernel logic hardware-independently.
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from smilecode_tpu.kernels.modet_attn import modet_attention_pallas
from smilecode_tpu.ops.attention import _neighborhood_attention_xla

RNG = np.random.default_rng(14)


@pytest.mark.parametrize(
    "shape,heads,scale",
    [((6, 8, 6), 2, 1.0), ((10, 12, 10), 8, 1.0), ((5, 6, 5), 1, 0.408)],
)
def test_kernel_matches_oracle(shape, heads, scale):
    d, h, w = shape
    hd = 6
    q = jnp.asarray(RNG.standard_normal((1, d, h, w, heads, hd)).astype(np.float32))
    k = jnp.asarray(RNG.standard_normal((1, d, h, w, heads, hd)).astype(np.float32))
    rpb = jnp.asarray((RNG.standard_normal((heads, 3, 3, 3)) * 0.1).astype(np.float32))
    out = modet_attention_pallas(q, k, rpb, scale, True)  # interpret=True
    ref = _neighborhood_attention_xla(q, k, rpb, scale)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=1e-5, rtol=1e-4)


def test_kernel_no_rpb():
    q = jnp.asarray(RNG.standard_normal((1, 4, 8, 4, 2, 6)).astype(np.float32))
    k = jnp.asarray(RNG.standard_normal((1, 4, 8, 4, 2, 6)).astype(np.float32))
    out = modet_attention_pallas(q, k, None, 1.0, True)
    ref = _neighborhood_attention_xla(q, k, None, 1.0)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=1e-5, rtol=1e-4)


@pytest.mark.parametrize(
    "shape,heads,scale",
    [pytest.param((4, 8, 4), 1, 1.0, marks=pytest.mark.slow),
     pytest.param((6, 10, 5), 2, 0.408, marks=pytest.mark.slow)],
)
def test_kernel_grads_match_oracle(shape, heads, scale):
    """Exercises the fused dq/dl/drpb + inverse-window dk kernels
    (mirrors `modet_kernel.cu:156-381`) against oracle autodiff."""
    d, h, w = shape
    q = jnp.asarray(RNG.standard_normal((1, d, h, w, heads, 6)).astype(np.float32))
    k = jnp.asarray(RNG.standard_normal((1, d, h, w, heads, 6)).astype(np.float32))
    rpb = jnp.asarray((RNG.standard_normal((heads, 3, 3, 3)) * 0.2).astype(np.float32))
    gcot = jnp.asarray(RNG.standard_normal((1, d, h, w, heads * 3)).astype(np.float32))

    def loss_pallas(q, k, r):
        return jnp.sum(modet_attention_pallas(q, k, r, scale, True) * gcot)

    def loss_oracle(q, k, r):
        return jnp.sum(_neighborhood_attention_xla(q, k, r, scale) * gcot)

    g1 = jax.grad(loss_pallas, argnums=(0, 1, 2))(q, k, rpb)
    g2 = jax.grad(loss_oracle, argnums=(0, 1, 2))(q, k, rpb)
    for a, b in zip(g1, g2):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=1e-4, rtol=1e-3)


@pytest.mark.slow  # ~23 s interpret-mode B2 backward; edge handling only
def test_kernel_grads_multiblock():
    """h=72 -> hp=72, hb=24, 3 h-blocks: exercises B2's clamped unpadded
    window reads at interior blocks (base=8) and both h edges (base=0 and
    the top clamp), which single-block shapes never hit."""
    d, h, w = 4, 72, 5
    q = jnp.asarray(RNG.standard_normal((1, d, h, w, 1, 4)).astype(np.float32))
    k = jnp.asarray(RNG.standard_normal((1, d, h, w, 1, 4)).astype(np.float32))
    rpb = jnp.asarray((RNG.standard_normal((1, 3, 3, 3)) * 0.2).astype(np.float32))
    gcot = jnp.asarray(RNG.standard_normal((1, d, h, w, 3)).astype(np.float32))

    def loss_pallas(q, k, r):
        return jnp.sum(modet_attention_pallas(q, k, r, 1.0, True) * gcot)

    def loss_oracle(q, k, r):
        return jnp.sum(_neighborhood_attention_xla(q, k, r, 1.0) * gcot)

    g1 = jax.grad(loss_pallas, argnums=(0, 1, 2))(q, k, rpb)
    g2 = jax.grad(loss_oracle, argnums=(0, 1, 2))(q, k, rpb)
    for a, b in zip(g1, g2):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=1e-4, rtol=1e-3)


def test_planes_grads_bf16_io():
    """bf16 q/k through the planes-diff entry: d_logits persists bf16
    (dtype-follow); grads must track the f32 oracle within bf16 tolerance."""
    from smilecode_tpu.kernels.modet_attn import modet_attention_planes_diff

    d, h, w, hd = 4, 8, 6, 4
    q = jnp.asarray(RNG.standard_normal((1, d, h, w, 1, hd)).astype(np.float32))
    k = jnp.asarray(RNG.standard_normal((1, d, h, w, 1, hd)).astype(np.float32))
    rpb = jnp.asarray((RNG.standard_normal((1, 3, 3, 3)) * 0.2).astype(np.float32))
    gcot = jnp.asarray(RNG.standard_normal((1, 3, d, h, w)).astype(np.float32))

    def to_planes(x):
        return x.transpose(0, 4, 1, 5, 2, 3).reshape(1, d, hd, h, w)

    def loss_bf16(q, k, r):
        out = modet_attention_planes_diff(
            to_planes(q).astype(jnp.bfloat16),
            to_planes(k).astype(jnp.bfloat16),
            r, 1, 1.0, True,
        )
        return jnp.sum(out * gcot)

    def loss_oracle(q, k, r):
        out = _neighborhood_attention_xla(q, k, r, 1.0)
        out = out.reshape(1, d, h, w, 1, 3).transpose(0, 4, 5, 1, 2, 3)
        return jnp.sum(out.reshape(1, 3, d, h, w) * gcot)

    g1 = jax.grad(loss_bf16, argnums=(0, 1, 2))(q, k, rpb)
    g2 = jax.grad(loss_oracle, argnums=(0, 1, 2))(q, k, rpb)
    for a, b in zip(g1, g2):
        err = np.abs(np.asarray(a, np.float32) - np.asarray(b))
        scale_ref = np.abs(np.asarray(b)).max() + 1e-6
        assert err.max() / scale_ref < 0.05, err.max() / scale_ref


@pytest.mark.slow  # rpb=None backward variant; multiblock covers B1/B2 f32
def test_kernel_grads_no_rpb():
    q = jnp.asarray(RNG.standard_normal((1, 4, 8, 4, 1, 6)).astype(np.float32))
    k = jnp.asarray(RNG.standard_normal((1, 4, 8, 4, 1, 6)).astype(np.float32))

    def loss_pallas(q, k):
        return jnp.sum(modet_attention_pallas(q, k, None, 1.0, True) ** 2)

    def loss_oracle(q, k):
        return jnp.sum(_neighborhood_attention_xla(q, k, None, 1.0) ** 2)

    g1 = jax.grad(loss_pallas, argnums=(0, 1))(q, k)
    g2 = jax.grad(loss_oracle, argnums=(0, 1))(q, k)
    for a, b in zip(g1, g2):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=1e-4, rtol=1e-3)


@pytest.mark.slow  # ~1 min of Pallas interpreter execution
def test_modet_with_pallas_impl_interpret():
    """Full ModeT with attn_impl='pallas' (interpreted) matches 'xla'."""
    from smilecode_tpu.models import ModeT

    shape = (16, 16, 16)
    m = jnp.asarray(RNG.random((1, *shape, 1), dtype=np.float64).astype(np.float32))
    f = jnp.asarray(RNG.random((1, *shape, 1), dtype=np.float64).astype(np.float32))
    model_x = ModeT(qk_scale=1.0, attn_impl="xla")
    model_p = ModeT(qk_scale=1.0, attn_impl="pallas")
    params = jax.jit(model_x.init)(jax.random.PRNGKey(0), m, f)
    mx, fx = model_x.apply(params, m, f)
    mp, fp = model_p.apply(params, m, f)
    np.testing.assert_allclose(np.asarray(mp), np.asarray(mx), atol=1e-4, rtol=1e-3)
    np.testing.assert_allclose(np.asarray(fp), np.asarray(fx), atol=1e-4, rtol=1e-3)


@pytest.mark.slow  # ~29 s interpret backward; D-sharded path also runs in dryrun stage 3
def test_planes_grads_k_prepadded_d():
    """k_prepadded_d (the D-sharded path): the kernel consumes k with its
    1-voxel D border supplied by the caller (halo slabs, NONZERO here) and
    the fused backward must emit cotangents for the FULL D+2 extent so they
    ride the halo-exchange transpose back to neighbor shards."""
    from smilecode_tpu.kernels.modet_attn import modet_attention_planes_diff

    d, h, w, heads, hd = 4, 10, 5, 2, 4
    q = jnp.asarray(RNG.standard_normal((1, d, h, w, heads, hd)).astype(np.float32))
    kpad = jnp.asarray(
        RNG.standard_normal((1, d + 2, h, w, heads, hd)).astype(np.float32)
    )
    rpb = jnp.asarray((RNG.standard_normal((heads, 3, 3, 3)) * 0.2).astype(np.float32))
    gcot = jnp.asarray(RNG.standard_normal((1, d, h, w, heads * 3)).astype(np.float32))

    def to_pl(x):
        b, dd, hh, ww, nh, c = x.shape
        return x.transpose(0, 4, 1, 5, 2, 3).reshape(b * nh, dd, c, hh, ww)

    gpl = gcot.reshape(1, d, h, w, heads, 3).transpose(0, 4, 5, 1, 2, 3)
    gpl = gpl.reshape(heads, 3, d, h, w)

    def loss_pallas(q, kp, r):
        out = modet_attention_planes_diff(
            to_pl(q), to_pl(kp), r, heads, 1.0, True, True
        )
        return jnp.sum(out * gpl)

    def loss_oracle(q, kp, r):
        out = _neighborhood_attention_xla(q, kp, r, 1.0, k_prepadded_d=True)
        return jnp.sum(out * gcot)

    g1 = jax.grad(loss_pallas, argnums=(0, 1, 2))(q, kpad, rpb)
    g2 = jax.grad(loss_oracle, argnums=(0, 1, 2))(q, kpad, rpb)
    for name, a, b in zip(("dq", "dk_pad", "drpb"), g1, g2):
        np.testing.assert_allclose(
            np.asarray(a), np.asarray(b), atol=1e-4, rtol=1e-3, err_msg=name
        )
