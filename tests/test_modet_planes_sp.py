"""D-sharded PLANES forward == unsharded planes forward (and flax model).

Runs on the 8-virtual-device CPU backend (conftest); exercises the planes
edition of halo convs / psum InstanceNorm / haloed fused attention
(k_prepadded_d) / cross-shard planes upsample / the all-gather global-coord
warp, end to end, plus the kernel-branch sharded warp in interpret mode.
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from smilecode_tpu.models import ModeT
from smilecode_tpu.models.modet_planes import (
    modet_forward_planes,
    to_planes,
    from_planes,
)
from smilecode_tpu.parallel.mesh import make_mesh
from smilecode_tpu.parallel import modet_planes_sp as MPS

SHAPE = (32, 32, 32)


def _excited_params(model, moving, fixed):
    params = jax.jit(model.init)(jax.random.PRNGKey(0), moving, fixed)

    def excite(path, x):
        name = "/".join(str(getattr(k, "key", k)) for k in path)
        if "proj/kernel" in name or "rpb" in name:
            return x + jax.random.normal(jax.random.PRNGKey(len(name)), x.shape) * 0.1
        return x

    return jax.tree_util.tree_map_with_path(excite, params)


@pytest.fixture(scope="module")
def planes_setup():
    model = ModeT(qk_scale=1.0)
    rng = np.random.default_rng(13)
    moving = jnp.asarray(rng.random((1, *SHAPE, 1), dtype=np.float64).astype(np.float32))
    fixed = jnp.asarray(rng.random((1, *SHAPE, 1), dtype=np.float64).astype(np.float32))
    params = _excited_params(model, moving, fixed)
    return model, params, moving, fixed


@pytest.mark.slow
@pytest.mark.parametrize("n_spatial", [2])
def test_planes_sharded_equals_unsharded(planes_setup, n_spatial):
    model, params, moving, fixed = planes_setup
    ref_moved, ref_flow = modet_forward_planes(params, moving, fixed, qk_scale=1.0)
    ref_moved, ref_flow = np.asarray(ref_moved), np.asarray(ref_flow)

    mesh = make_mesh(dp=1, spatial=n_spatial)
    moved, flow = MPS.modet_forward_planes_spatial(
        mesh, params, moving, fixed, qk_scale=1.0
    )
    assert float(jnp.abs(flow).max()) > 1e-3  # non-trivial field
    # atol 5e-4 (vs 2e-4 elsewhere): this compares TWO different-but-
    # equivalent encoders (unsharded planes runs s2d, sharded runs the halo
    # NDHWC chain) so fp accumulation noise compounds; observed worst-case
    # 3.6e-4 on 0.003% of voxels
    np.testing.assert_allclose(np.asarray(flow), ref_flow, atol=5e-4, rtol=1e-3)
    np.testing.assert_allclose(np.asarray(moved), ref_moved, atol=5e-4, rtol=1e-3)


def test_planes_sharded_wrong_divisibility(planes_setup):
    model, params, moving, fixed = planes_setup
    mesh = make_mesh(dp=1, spatial=2)
    bad = jnp.zeros((1, 24, 32, 32, 1), jnp.float32)
    with pytest.raises(ValueError):
        MPS.modet_forward_planes_spatial(mesh, params, bad, bad)


def test_warp_planes_sp_kernel_branches(monkeypatch):
    """The sharded warp's v4/v3/oracle switch (interpret-mode kernels on the
    all-gathered source with GLOBAL coords) matches the unsharded oracle."""
    from jax import shard_map
    from jax.sharding import NamedSharding, PartitionSpec as P
    from smilecode_tpu.ops.warp import warp as warp_ref

    monkeypatch.setattr(MPS, "_SP_INTERPRET", True)
    monkeypatch.setattr(MPS, "_V4_MIN_VOXELS", 1)

    rng = np.random.default_rng(3)
    d, h, w = 16, 16, 32
    src = jnp.asarray(rng.random((1, d, h, w, 2), dtype=np.float64).astype(np.float32))
    g = np.stack(
        np.meshgrid(*[np.linspace(0, 2 * np.pi, s) for s in (d, h, w)], indexing="ij"),
        -1,
    )
    cases = {
        "v4-smooth": 1.5
        * np.stack(
            [np.sin(g[..., 0] + i) * np.cos(g[..., 1] - i) for i in range(3)], -1
        ).astype(np.float32),
    }
    ramp = np.zeros((d, h, w, 3), np.float32)
    ramp[..., 0] = np.linspace(-5, 5, h)[None, :, None]
    cases["v3-ramp"] = ramp
    wild = np.zeros((d, h, w, 3), np.float32)
    wild[::2, ..., 0] = 8.0
    wild[1::2, ..., 0] = -8.0
    cases["oracle-wild"] = wild

    mesh = make_mesh(dp=1, spatial=2)
    spec = P(None, None, "spatial")

    def run(s_planes, f_planes):
        return MPS.warp_planes_sp(s_planes, f_planes, on_tpu=False, guarded=True)

    sharded = jax.jit(
        shard_map(
            run, mesh=mesh, in_specs=(spec, spec), out_specs=spec, check_vma=False
        )
    )

    for name, fl in cases.items():
        flow = jnp.asarray(fl)[None]
        ref = np.asarray(warp_ref(src, flow))
        sp = to_planes(src)
        fp = flow.transpose(0, 4, 1, 2, 3)
        sp = jax.device_put(sp, NamedSharding(mesh, spec))
        fp = jax.device_put(fp, NamedSharding(mesh, spec))
        out = from_planes(sharded(sp, fp))
        np.testing.assert_allclose(
            np.asarray(out), ref, atol=2e-5, rtol=1e-5, err_msg=name
        )


def test_upsample2_planes_sp_matches_unsharded():
    from jax import shard_map
    from jax.sharding import NamedSharding, PartitionSpec as P
    from smilecode_tpu.models.modet_planes import upsample2_planes

    rng = np.random.default_rng(5)
    x = jnp.asarray(rng.standard_normal((1, 3, 8, 12, 16)).astype(np.float32))
    ref = np.asarray(upsample2_planes(x))

    mesh = make_mesh(dp=1, spatial=4)
    spec = P(None, None, "spatial")
    run = jax.jit(
        shard_map(
            MPS.upsample2_planes_sp,
            mesh=mesh,
            in_specs=(spec,),
            out_specs=spec,
            check_vma=False,
        )
    )
    out = run(jax.device_put(x, NamedSharding(mesh, spec)))
    np.testing.assert_allclose(np.asarray(out), ref, atol=1e-5, rtol=1e-5)


def test_conv3_planes_sp_matches_unsharded():
    from jax import shard_map
    from jax.sharding import NamedSharding, PartitionSpec as P
    from smilecode_tpu.models.modet_planes import conv3_planes

    rng = np.random.default_rng(6)
    x = jnp.asarray(rng.standard_normal((1, 5, 8, 10, 12)).astype(np.float32))
    p = {
        "kernel": jnp.asarray(rng.standard_normal((3, 3, 3, 5, 4)).astype(np.float32) * 0.2),
        "bias": jnp.asarray(rng.standard_normal((4,)).astype(np.float32)),
    }
    ref = np.asarray(conv3_planes(p, x))

    mesh = make_mesh(dp=1, spatial=4)
    spec = P(None, None, "spatial")
    run = jax.jit(
        shard_map(
            lambda xx: MPS.conv3_planes_sp(p, xx),
            mesh=mesh,
            in_specs=(spec,),
            out_specs=spec,
            check_vma=False,
        )
    )
    out = run(jax.device_put(x, NamedSharding(mesh, spec)))
    np.testing.assert_allclose(np.asarray(out), ref, atol=1e-4, rtol=1e-4)


@pytest.mark.slow
def test_spatial_train_loss_grads_equal_unsharded(monkeypatch):
    """The D-sharded planes training backward (halo/psum transposes, sharded
    warp custom VJP, sharded NCC/Grad3d) == unsharded planes autodiff of the
    same objective — verified EXACTLY in float64.

    Why f64: in f32 the two graphs (s2d vs halo-NDHWC encoder, local vs
    global warp coords) are equal-but-reordered, and two mechanisms amplify
    their ~1e-6 fp noise into up to ~3e-2 relative grad differences that a
    bounds-based f32 comparison cannot separate from real bugs:
      * InstanceNorm at the deep levels normalizes over 2-4 voxels, so its
        backward is catastrophically ill-conditioned (measured: enc-level-5
        cotangents give 1.8e-2 kernel-grad diffs in f32, 1e-12 in f64);
      * near-init flows are ~0, so warp sample coords sit ON the integer
        grid — the floor() kink of bilinear interpolation — where 1e-6
        coordinate noise flips the interpolation cell and the d_flow slope.
    In f64 both effects vanish (noise 1e-12 can't flip cells or dominate
    cancellation), so this asserts STRUCTURAL equality of the sharded
    backward at ~1e-8. Attention runs the XLA oracle on both sides (the
    fused Pallas kernels are f32-only; their backward equality incl. the
    k_prepadded_d halo-slab contract is owned by tests/test_pallas_attn.py).
    """
    from smilecode_tpu.losses.core import ncc_vxm, grad3d
    from smilecode_tpu.models import modet_planes as MP

    monkeypatch.setattr(MP, "modet_attention_planes_diff",
                        _oracle_attention_planes_prepad)
    monkeypatch.setattr(MPS, "modet_attention_planes_diff",
                        _oracle_attention_planes_prepad)

    jax.config.update("jax_enable_x64", True)
    try:
        shape = (32, 16, 16)  # D divisible by 16 * 2 shards
        model = ModeT(qk_scale=1.0)
        rng = np.random.default_rng(17)
        moving = jnp.asarray(rng.random((1, *shape, 1)))  # f64
        fixed = jnp.asarray(rng.random((1, *shape, 1)))
        params = _excited_params(model, moving, fixed)
        params = jax.tree.map(lambda x: x.astype(jnp.float64), params)

        def loss_ref(p):
            moved, flow = modet_forward_planes(p, moving, fixed, qk_scale=1.0)
            return ncc_vxm(fixed, moved) + grad3d(flow, penalty="l2")

        ref_loss, ref_grads = jax.jit(jax.value_and_grad(loss_ref))(params)

        mesh = make_mesh(dp=1, spatial=2)
        loss, grads = MPS.modet_train_loss_spatial(
            mesh, params, moving, fixed, qk_scale=1.0, weights=(1.0, 1.0)
        )
        assert np.isfinite(float(loss))
        np.testing.assert_allclose(float(loss), float(ref_loss), rtol=1e-12)

        flat1 = jax.tree_util.tree_leaves_with_path(ref_grads["params"])
        flat2 = {tuple(str(getattr(k, "key", k)) for k in p): v
                 for p, v in jax.tree_util.tree_leaves_with_path(grads)}
        global_max = max(float(jnp.abs(v).max()) for _, v in flat1)
        for p, v1 in flat1:
            key = tuple(str(getattr(k, "key", k)) for k in p)
            v2 = flat2[key]
            # near-zero leaves (conv biases feeding InstanceNorm) judged
            # against the global gradient scale
            scale = max(float(jnp.abs(v1).max()), 1e-2 * global_max)
            err = float(jnp.abs(v1 - v2).max()) / scale
            assert err < 1e-6, (key, err, float(jnp.abs(v1).max()))
    finally:
        jax.config.update("jax_enable_x64", False)


def test_losses_sp_match_unsharded():
    """Sharded NCC/Grad3d contributions psum to the unsharded values."""
    from jax import shard_map
    from jax.sharding import NamedSharding, PartitionSpec as P
    from smilecode_tpu.losses.core import ncc_vxm, grad3d

    rng = np.random.default_rng(9)
    a = jnp.asarray(rng.random((2, 16, 12, 10, 1), dtype=np.float64).astype(np.float32))
    b = jnp.asarray(rng.random((2, 16, 12, 10, 1), dtype=np.float64).astype(np.float32))
    fl = jnp.asarray(rng.standard_normal((1, 16, 12, 10, 3)).astype(np.float32))

    mesh = make_mesh(dp=1, spatial=4)
    spec = P(None, "spatial")

    def local(aa, bb, ff):
        ncc = jax.lax.psum(MPS.ncc_sp(aa, bb), "spatial")
        g_l1 = jax.lax.psum(MPS.grad3d_sp(ff, "l1"), "spatial")
        g_l2 = jax.lax.psum(MPS.grad3d_sp(ff, "l2", loss_mult=2.0), "spatial")
        return ncc, g_l1, g_l2

    run = jax.jit(shard_map(
        local, mesh=mesh, in_specs=(spec, spec, spec),
        out_specs=(P(), P(), P()), check_vma=False,
    ))
    aa = jax.device_put(a, NamedSharding(mesh, spec))
    bb = jax.device_put(b, NamedSharding(mesh, spec))
    ff = jax.device_put(fl, NamedSharding(mesh, spec))
    ncc, g_l1, g_l2 = run(aa, bb, ff)
    np.testing.assert_allclose(float(ncc), float(ncc_vxm(a, b)), atol=1e-5, rtol=1e-5)
    np.testing.assert_allclose(float(g_l1), float(grad3d(fl, "l1")), atol=1e-6, rtol=1e-5)
    np.testing.assert_allclose(
        float(g_l2), float(grad3d(fl, "l2", loss_mult=2.0)), atol=1e-6, rtol=1e-5
    )


def _oracle_attention_planes_prepad(qs, kpl, rpb, heads, scale=1.0,
                                    interpret=False, k_prepadded_d=False):
    """XLA-oracle twin of `modet_attention_planes_diff` incl. the prepadded-k
    contract (test speed: interpret-mode Pallas adds no coverage here —
    tests/test_pallas_attn.py owns kernel-vs-oracle equality)."""
    from smilecode_tpu.ops.attention import _neighborhood_attention_xla

    bh, d, hd, h, w = qs.shape
    b = bh // heads

    def to_ndhwc(x):
        dd = x.shape[1]
        return x.reshape(b, heads, dd, hd, h, w).transpose(0, 2, 4, 5, 1, 3)

    out = _neighborhood_attention_xla(
        to_ndhwc(qs), to_ndhwc(kpl), rpb, scale, k_prepadded_d=k_prepadded_d
    )
    out = out.reshape(b, d, h, w, heads, 3).transpose(0, 4, 5, 1, 2, 3)
    return out.reshape(bh, 3, d, h, w)


@pytest.mark.slow
def test_spatial_train_step_matches_single_device(monkeypatch):
    """`train.make_train_step_spatial` on a (data=2, spatial=2) mesh takes
    the same SGD step as the single-device planes fast path (gradient
    equality through the sharded backward, composed with DP).

    slow: ~50 s of full-model fwd+bwd compiles; the same property runs
    under the driver as dryrun stage 3 and the loss/grad equality core is
    pinned by test_spatial_train_loss_grads_equal_unsharded."""
    import optax
    from smilecode_tpu.config import TrainConfig
    from smilecode_tpu.models.registry import build_model
    from smilecode_tpu.models import modet_planes as MP
    from smilecode_tpu.parallel.mesh import make_mesh, replicate, shard_batch
    from smilecode_tpu.train import make_train_step, make_train_step_spatial

    monkeypatch.setattr(MP, "modet_attention_planes_diff",
                        _oracle_attention_planes_prepad)
    monkeypatch.setattr(MPS, "modet_attention_planes_diff",
                        _oracle_attention_planes_prepad)

    cfg = TrainConfig(channels=2, head_dim=2, num_heads=(2, 2, 1, 1, 1),
                      dp=2, spatial=2)
    spec = build_model("modet", cfg)
    shape = (32, 32, 32)
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.random((2, *shape, 1), np.float32))
    y = jnp.asarray(rng.random((2, *shape, 1), np.float32))
    dummy = jnp.zeros((1, *shape, 1), jnp.float32)
    params = jax.jit(spec.module.init)(jax.random.PRNGKey(0), dummy, dummy)
    # sgd: params' diff = lr * grads' diff -> asserts gradient equality (see
    # test_train_dp_planes.py for why not adam)
    tx = optax.sgd(1e-2)

    # copies first: both steps donate their params argument
    mesh = make_mesh(cfg.dp, cfg.spatial)
    p0 = replicate(mesh, params)
    xs, ys = shard_batch(mesh, (x, y))
    opt0 = tx.init(p0)

    # the replicated p0 ALIASES params' device-0 buffer (device_put reuses
    # it as one replica), so the donating ref step gets an explicit copy
    ref_step = make_train_step(spec, tx, [1.0, 1.0], use_fast=True)
    p_copy = jax.tree.map(jnp.copy, params)
    p_ref, _, loss_ref, _ = ref_step(p_copy, tx.init(params), x, y)

    sp_step = make_train_step_spatial(cfg, tx, [1.0, 1.0], mesh)
    p_sp, _, loss_sp, loss_vals = sp_step(p0, opt0, xs, ys)

    assert np.isfinite(float(loss_sp))
    np.testing.assert_allclose(float(loss_sp), float(loss_ref), atol=2e-5, rtol=1e-4)
    for (k1, v1), (k2, v2) in zip(
        sorted(jax.tree_util.tree_leaves_with_path(p_ref), key=lambda t: str(t[0])),
        sorted(jax.tree_util.tree_leaves_with_path(p_sp), key=lambda t: str(t[0])),
    ):
        assert str(k1) == str(k2)
        np.testing.assert_allclose(
            np.asarray(v2), np.asarray(v1), atol=5e-6, rtol=1e-4, err_msg=str(k1)
        )
