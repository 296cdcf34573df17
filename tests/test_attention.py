"""Parity tests for neighborhood attention (xla oracle vs torch unfold)."""

import numpy as np
import torch

import jax
import jax.numpy as jnp

from smilecode_tpu.ops.attention import neighborhood_attention_3d, offset_grid
from tests.torch_ref import torch_neighborhood_attention

RNG = np.random.default_rng(2)


def test_offset_grid_ordering():
    offs = offset_grid(3)
    assert offs.shape == (27, 3)
    # token t = (od*3+oh)*3+ow, offset = (od-1, oh-1, ow-1)
    assert offs[0].tolist() == [-1, -1, -1]
    assert offs[13].tolist() == [0, 0, 0]
    assert offs[26].tolist() == [1, 1, 1]
    assert offs[1].tolist() == [-1, -1, 0]
    assert offs[9].tolist() == [0, -1, -1]


def _run_pair(heads, head_dim, shape, scale, use_rpb=True):
    b = 1
    d, h, w = shape
    c = heads * head_dim
    q = RNG.standard_normal((b, d, h, w, c)).astype(np.float32)
    k = RNG.standard_normal((b, d, h, w, c)).astype(np.float32)
    rpb = (RNG.standard_normal((heads, 3, 3, 3)) * 0.1).astype(np.float32)

    # ours: (B,D,H,W,heads,head_dim) — reference splits channels head-major
    qj = jnp.asarray(q.reshape(b, d, h, w, heads, head_dim))
    kj = jnp.asarray(k.reshape(b, d, h, w, heads, head_dim))
    ours = np.asarray(
        neighborhood_attention_3d(qj, kj, jnp.asarray(rpb) if use_rpb else None, scale=scale)
    )

    ref = torch_neighborhood_attention(
        torch.from_numpy(q),
        torch.from_numpy(k),
        torch.from_numpy(rpb if use_rpb else np.zeros_like(rpb)),
        scale,
    )
    ref = np.moveaxis(ref.numpy(), 1, -1)  # NCDHW -> NDHWC
    return ours, ref


def test_vs_torch_multihead():
    ours, ref = _run_pair(heads=4, head_dim=6, shape=(5, 6, 5), scale=1.0)
    np.testing.assert_allclose(ours, ref, atol=2e-5, rtol=1e-4)


def test_vs_torch_single_head_scaled():
    ours, ref = _run_pair(heads=1, head_dim=6, shape=(6, 6, 6), scale=6 ** -0.5)
    np.testing.assert_allclose(ours, ref, atol=2e-5, rtol=1e-4)


def test_uniform_attention_zero_field():
    # q=0 => logits all equal (rpb=0) => softmax uniform => sum of offsets = 0
    b, d, h, w, heads, hd = 1, 4, 4, 4, 2, 3
    q = jnp.zeros((b, d, h, w, heads, hd))
    k = jnp.asarray(RNG.standard_normal((b, d, h, w, heads, hd)).astype(np.float32))
    out = np.asarray(neighborhood_attention_3d(q, k, None, scale=1.0))
    np.testing.assert_allclose(out, 0.0, atol=1e-6)


def test_grads_finite():
    b, d, h, w, heads, hd = 1, 4, 4, 4, 2, 3
    q = jnp.asarray(RNG.standard_normal((b, d, h, w, heads, hd)).astype(np.float32))
    k = jnp.asarray(RNG.standard_normal((b, d, h, w, heads, hd)).astype(np.float32))
    rpb = jnp.zeros((heads, 3, 3, 3))

    def loss(q, k, rpb):
        return jnp.sum(neighborhood_attention_3d(q, k, rpb, scale=1.0) ** 2)

    gq, gk, gr = jax.grad(loss, argnums=(0, 1, 2))(q, k, rpb)
    for g in (gq, gk, gr):
        assert np.isfinite(np.asarray(g)).all()
    assert float(jnp.max(jnp.abs(gq))) > 0


def test_kernel_size_whitelist_and_k5():
    """kernel_size generality: the reference whitelists k in {3,5,7,9,11,13}
    (`ModeT-cu/modet/include/utils.h:11-14`) though its launcher only accepts
    3; our oracle implements the whole whitelist. Brute-force check at k=5."""
    import pytest

    b, d, h, w, heads, hd = 1, 4, 5, 4, 2, 3
    q = RNG.standard_normal((b, d, h, w, heads, hd)).astype(np.float32)
    k = RNG.standard_normal((b, d, h, w, heads, hd)).astype(np.float32)
    rpb = (RNG.standard_normal((heads, 5, 5, 5)) * 0.1).astype(np.float32)

    out = np.asarray(
        neighborhood_attention_3d(
            jnp.asarray(q), jnp.asarray(k), jnp.asarray(rpb),
            scale=0.7, kernel_size=5,
        )
    )

    # naive per-voxel reference
    kp = np.zeros((b, d + 4, h + 4, w + 4, heads, hd), np.float32)
    kp[:, 2:-2, 2:-2, 2:-2] = k
    ref = np.zeros((b, d, h, w, heads, 3), np.float32)
    for di in range(d):
        for hi in range(h):
            for wi in range(w):
                for he in range(heads):
                    logits = np.empty(125, np.float64)
                    offs = np.empty((125, 3), np.float64)
                    t = 0
                    for od in range(5):
                        for oh in range(5):
                            for ow in range(5):
                                kv = kp[0, di + od, hi + oh, wi + ow, he]
                                logits[t] = (q[0, di, hi, wi, he] * 0.7) @ kv \
                                    + rpb[he, od, oh, ow]
                                offs[t] = (od - 2, oh - 2, ow - 2)
                                t += 1
                    e = np.exp(logits - logits.max())
                    ref[0, di, hi, wi, he] = (e / e.sum()) @ offs
    np.testing.assert_allclose(
        out, ref.reshape(b, d, h, w, heads * 3), atol=2e-5, rtol=1e-4
    )

    with pytest.raises(ValueError):
        neighborhood_attention_3d(
            jnp.asarray(q), jnp.asarray(k), None, kernel_size=4)
    with pytest.raises(ValueError):
        neighborhood_attention_3d(
            jnp.asarray(q), jnp.asarray(k), None, kernel_size=5, impl="pallas")
