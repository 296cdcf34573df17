"""Planes-layout ModeT forward == flax ModeT (same params, same numerics).

On CPU the attention runs the interpret-mode Pallas kernel and warps run the
coordinate oracle, so this validates the planes graph itself; the TPU fast
path shares this exact code with only the warp/attention backends swapped.
"""

import functools

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from smilecode_tpu.models import ModeT
from smilecode_tpu.models.modet_planes import (
    modet_forward_planes,
    upsample2_planes,
    conv3_planes,
    to_planes,
    from_planes,
)

RNG = np.random.default_rng(7)
SHAPE = (32, 32, 32)


@pytest.fixture
def hw_warp_interpret(monkeypatch):
    """Route _warp_planes_hw's kernels through Pallas interpret mode and
    force the big-volume (v4-first) switch at test sizes."""
    import smilecode_tpu.models.modet_planes as MP

    monkeypatch.setattr(MP, "_V3_INTERPRET", True)
    monkeypatch.setattr(MP, "_V4_MIN_VOXELS", 1)
    return MP


def _hw_case_flows(shape):
    """(name, expected switch index, flow) cases hitting each guard branch:
    smooth -> v4 (0); medium d ramp (plane spread 10: beats KD=8's budget 6,
    fits the wide window's 14) -> v4wide (1); steep d ramp (plane spread 18
    beats both v4 windows, but the per-8-row-tile spread stays within v3's
    budget) -> v3 (2); alternating wild d -> oracle (3)."""
    d, h, w = shape
    g = np.stack(
        np.meshgrid(*[np.linspace(0, 2 * np.pi, s) for s in shape], indexing="ij"), -1
    )
    smooth = 1.5 * np.stack(
        [np.sin(g[..., 0] + i) * np.cos(g[..., 1] - i) for i in range(3)], -1
    )
    ramp = np.zeros((*shape, 3), np.float32)
    ramp[..., 0] = np.linspace(-5, 5, h)[None, :, None]
    steep = np.zeros((*shape, 3), np.float32)
    steep[..., 0] = np.linspace(-9, 9, h)[None, :, None]
    # alternate d displacement along H so every plane AND every 8-row tile
    # sees the full 16-voxel d spread (alternating along D would leave each
    # plane's displacement constant — which v4 handles exactly)
    wild = np.zeros((*shape, 3), np.float32)
    wild[:, ::2, :, 0] = 8.0
    wild[:, 1::2, :, 0] = -8.0
    return [
        ("v4", 0, smooth.astype(np.float32)),
        ("v4wide", 1, ramp),
        ("v3", 2, steep),
        ("oracle", 3, wild),
    ]


def test_hw_warp_switch_routing(hw_warp_interpret):
    """Each case must land on its intended guard branch (the branch index
    computed from the violation counts, as _warp_planes_hw computes it)."""
    MP = hw_warp_interpret
    shape = (16, 24, 16)
    d, h, w = shape
    for name, want_idx, fl in _hw_case_flows(shape):
        flow = jnp.asarray(fl[None]).transpose(0, 4, 1, 2, 3)
        cd, ch, cw = MP._planes_coords(flow, d, h, w)
        viol4 = MP._v4_violations_from_coords(cd, d)
        viol4w = MP._v4_violations_from_coords(cd, d, MP._KD4_WIDE)
        viol3 = MP._violations_from_coords(cd, ch, d, h, w)
        idx = int(jnp.where(
            viol4 == 0, 0,
            jnp.where(viol4w == 0, 1, jnp.where(viol3 == 0, 2, 3)),
        ))
        assert idx == want_idx, f"{name}: routed to branch {idx}"


def test_hw_warp_switch_branches_match_oracle(hw_warp_interpret):
    MP = hw_warp_interpret
    shape, c = (16, 24, 16), 2
    src = jnp.asarray(RNG.standard_normal((1, c, *shape)).astype(np.float32))
    for name, _, fl in _hw_case_flows(shape):
        flow = jnp.asarray(fl[None]).transpose(0, 4, 1, 2, 3)
        ref = MP._warp_planes_ref(src, flow)
        out = MP._warp_planes_hw(src, flow, True)
        np.testing.assert_allclose(
            np.asarray(out), np.asarray(ref), atol=3e-5, err_msg=name
        )


def test_hw_warp_switch_vjp_matches_oracle(hw_warp_interpret):
    MP = hw_warp_interpret
    shape, c = (12, 16, 16), 2
    src = jnp.asarray(RNG.standard_normal((1, c, *shape)).astype(np.float32))
    for name, _, fl in _hw_case_flows(shape):
        flow = jnp.asarray(fl[None]).transpose(0, 4, 1, 2, 3)

        def loss_hw(s, f):
            return jnp.sum(MP._warp_planes_hw(s, f, True) ** 2)

        def loss_ref(s, f):
            return jnp.sum(MP._warp_planes_ref(s, f) ** 2)

        gs, gf = jax.grad(loss_hw, argnums=(0, 1))(src, flow)
        rs, rf = jax.grad(loss_ref, argnums=(0, 1))(src, flow)
        np.testing.assert_allclose(np.asarray(gs), np.asarray(rs), atol=1e-3, err_msg=name)
        np.testing.assert_allclose(np.asarray(gf), np.asarray(rf), atol=1e-3, err_msg=name)


def test_upsample2_planes_matches_ndhwc():
    from smilecode_tpu.ops.resize import upsample2_trilinear

    x = jnp.asarray(RNG.standard_normal((1, 6, 10, 12, 5)).astype(np.float32))
    ref = upsample2_trilinear(x)
    out = from_planes(upsample2_planes(to_planes(x)))
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=1e-5, rtol=1e-5)


def test_conv3_planes_matches_xla_conv():
    x = jnp.asarray(RNG.standard_normal((1, 8, 10, 8, 6)).astype(np.float32))
    kern = jnp.asarray(RNG.standard_normal((3, 3, 3, 6, 4)).astype(np.float32) * 0.2)
    bias = jnp.asarray(RNG.standard_normal((4,)).astype(np.float32))
    ref = jax.lax.conv_general_dilated(
        x, kern, (1, 1, 1), [(1, 1)] * 3, dimension_numbers=("NDHWC", "DHWIO", "NDHWC")
    ) + bias
    out = from_planes(conv3_planes({"kernel": kern, "bias": bias}, to_planes(x)))
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=1e-4, rtol=1e-4)


def test_bf16_vs_f32_warp_kernel(hw_warp_interpret):
    """Fast kernel-level pin for bf16 warp numerics (VERDICT r3 item 2): a
    bf16 source through the v4-first hardware warp switch must track the
    f32 oracle within bf16 rounding on a smooth in-budget flow. The round-3
    regression mechanism (bf16 v3/v4 window handling around the dynamic
    rolls) produced O(0.3) errors — an order of magnitude above this bound —
    so bf16 kernel numerics can't change unmeasured even in the fast suite;
    the full-graph pin (test_bf16_vs_f32_with_kernels) is `slow`."""
    MP = hw_warp_interpret
    shape, c = (16, 24, 16), 2
    src = jnp.asarray(RNG.standard_normal((1, c, *shape)).astype(np.float32))
    name, _, fl = _hw_case_flows(shape)[0]
    assert name == "v4"
    flow = jnp.asarray(fl[None]).transpose(0, 4, 1, 2, 3)
    ref = MP._warp_planes_ref(src, flow)
    out16 = MP._warp_planes_hw(src.astype(jnp.bfloat16), flow, True)
    err = np.abs(np.asarray(out16, np.float32) - np.asarray(ref))
    assert float(err.max()) < 0.03, err.max()


@pytest.mark.slow
def test_bf16_vs_f32_with_kernels(hw_warp_interpret, monkeypatch):
    """Off-chip pin for bench.py's bf16 parity gate (VERDICT r3 item 2): the
    bf16-vs-f32 flow endpoint error through the PLANES graph with the v3/v4
    warp kernels actually engaged (interpret mode, v4-first switch forced),
    excited params, smooth volumes, guarded_warp=True — the production
    infer configuration the on-chip gate now measures. The round-3
    regression (gate p99 0.115 -> 0.329) was invisible off-chip because no
    CPU test ran bf16 through the kernel wiring; this one does, so bf16
    kernel numerics can never again change unmeasured."""
    MP = hw_warp_interpret
    model = ModeT(qk_scale=1.0)

    g = np.stack(np.meshgrid(*[np.arange(s) for s in SHAPE], indexing="ij"), -1)

    def smooth_vol(seed):
        r = np.random.default_rng(seed)
        v = np.zeros(SHAPE, np.float32)
        for _ in range(30):
            c, s, a = r.uniform(4, 28, 3), r.uniform(2, 6), r.uniform(0.3, 1.0)
            v += a * np.exp(-np.sum((g - c) ** 2, -1) / (2 * s * s))
        return jnp.asarray(((v - v.min()) / (v.max() - v.min()))[None, ..., None])

    moving, fixed = smooth_vol(1), smooth_vol(2)
    params = jax.jit(model.init)(jax.random.PRNGKey(0), moving, fixed)

    def excite(path, x):
        name = "/".join(str(getattr(k, "key", k)) for k in path)
        if "proj/kernel" in name or "rpb" in name:
            return x + jax.random.normal(jax.random.PRNGKey(len(name)), x.shape) * 0.1
        return x

    eparams = jax.tree_util.tree_map_with_path(excite, params)

    # CPU runs the oracle warp by default; force the hardware-kernel wiring
    # (the fixture already routes its v3/v4 Pallas calls to interpret mode)
    orig = MP.warp_planes
    monkeypatch.setattr(
        MP, "warp_planes",
        lambda src, flow, on_tpu, guarded=True: orig(src, flow, True, guarded),
    )

    # jit: eager CPU dispatch pays minutes of per-op mini-compiles (the
    # round-2 dryrun lesson); one traced compile per dtype is ~10x faster
    @functools.partial(jax.jit, static_argnums=(0,))
    def fwd(dt, p, m, f):
        return modet_forward_planes(
            p, m, f, qk_scale=1.0, guarded_warp=True, compute_dtype=dt,
        )

    _, flow32 = fwd(None, eparams, moving, fixed)
    _, flow16 = fwd("bfloat16", eparams, moving, fixed)
    assert flow16.dtype == jnp.float32
    assert float(jnp.abs(flow32).max()) > 0.05  # excited flows, not degenerate
    err = np.abs(np.asarray(flow16) - np.asarray(flow32))
    # bounds from tests/test_modet.py::test_bf16_compute_matches_f32 (the
    # same recipe through the flax graph); the kernels must not add to them
    assert float(err.mean()) < 0.06, err.mean()
    assert float(np.percentile(err, 99)) < 0.3, np.percentile(err, 99)


@pytest.mark.slow
def test_planes_forward_equals_flax():
    model = ModeT(qk_scale=1.0)
    moving = jnp.asarray(RNG.random((1, *SHAPE, 1), dtype=np.float64).astype(np.float32))
    fixed = jnp.asarray(RNG.random((1, *SHAPE, 1), dtype=np.float64).astype(np.float32))
    params = jax.jit(model.init)(jax.random.PRNGKey(0), moving, fixed)

    def excite(path, x):
        name = "/".join(str(getattr(k, "key", k)) for k in path)
        if "proj/kernel" in name or "rpb" in name:
            return x + jax.random.normal(jax.random.PRNGKey(len(name)), x.shape) * 0.1
        return x

    eparams = jax.tree_util.tree_map_with_path(excite, params)
    ref_moved, ref_flow = model.apply(eparams, moving, fixed)
    moved, flow = modet_forward_planes(eparams, moving, fixed, qk_scale=1.0)
    assert float(jnp.abs(ref_flow).max()) > 1e-3
    np.testing.assert_allclose(
        np.asarray(flow), np.asarray(ref_flow), atol=2e-4, rtol=1e-3
    )
    np.testing.assert_allclose(
        np.asarray(moved), np.asarray(ref_moved), atol=2e-4, rtol=1e-3
    )


@pytest.mark.slow
def test_planes_grads_equal_flax():
    """d(loss)/d(params) through the planes path (fused Pallas attention
    backward + oracle-VJP warps) == flax autodiff."""
    from smilecode_tpu.models.modet_planes import modet_forward_planes

    shape = (16, 32, 16)
    model = ModeT(qk_scale=1.0)
    moving = jnp.asarray(RNG.random((1, *shape, 1), dtype=np.float64).astype(np.float32))
    fixed = jnp.asarray(RNG.random((1, *shape, 1), dtype=np.float64).astype(np.float32))
    params = jax.jit(model.init)(jax.random.PRNGKey(0), moving, fixed)

    def excite(path, x):
        name = "/".join(str(getattr(k, "key", k)) for k in path)
        if "proj/kernel" in name or "rpb" in name:
            return x + jax.random.normal(jax.random.PRNGKey(len(name)), x.shape) * 0.1
        return x

    eparams = jax.tree_util.tree_map_with_path(excite, params)

    def loss_flax(p):
        moved, flow = model.apply(p, moving, fixed)
        return jnp.sum(moved * moved) + jnp.sum(jnp.abs(flow))

    def loss_planes(p):
        moved, flow = modet_forward_planes(p, moving, fixed, qk_scale=1.0)
        return jnp.sum(moved * moved) + jnp.sum(jnp.abs(flow))

    g1 = jax.grad(loss_flax)(eparams)
    g2 = jax.grad(loss_planes)(eparams)
    flat1 = jax.tree_util.tree_leaves_with_path(g1)
    flat2 = {tuple(str(getattr(k, "key", k)) for k in p): v
             for p, v in jax.tree_util.tree_leaves_with_path(g2)}
    global_max = max(float(jnp.abs(v).max()) for _, v in flat1)
    for p, v1 in flat1:
        key = tuple(str(getattr(k, "key", k)) for k in p)
        v2 = flat2[key]
        # near-zero-gradient leaves (e.g. conv biases feeding InstanceNorm,
        # whose bias gradient is mathematically ~0 via mean subtraction) are
        # pure fp32 cancellation noise — judge them against the GLOBAL
        # gradient scale, not their own
        scale = max(float(jnp.abs(v1).max()), 1e-2 * global_max)
        err = float(jnp.abs(v1 - v2).max()) / scale
        assert err < 5e-3, (key, err, float(jnp.abs(v1).max()))
