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
