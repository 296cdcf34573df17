"""warp3d_v3 (relative-shift, channel-batched) kernel vs the naive oracle.

Covers: odd level-5 dims, channel batching, multi-chunk lanes (fw > 128),
OOB zeros padding, negative displacements (HMARGIN path), bf16 windows,
and the violations guard math.
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from smilecode_tpu.kernels.warp3d_v3 import (
    KD,
    KHA,
    warp3d_planes_v3,
    warp_v3_window_violations,
)
from smilecode_tpu.ops.warp import _warp_simple, base_grid

RNG = np.random.default_rng(11)


def smooth_flow(shape, amp, freq):
    g = np.stack(
        np.meshgrid(*[np.linspace(0, freq * np.pi, s) for s in shape], indexing="ij"),
        -1,
    )
    fl = amp * np.stack(
        [
            np.sin(g[..., 0] + i) * np.cos(g[..., 1] - i) * np.sin(g[..., 2] + 2 * i)
            for i in range(3)
        ],
        -1,
    )
    return jnp.asarray(fl[None].astype(np.float32))


def v3(src, fl, interpret=True):
    b, d, h, w, c = src.shape
    coords = base_grid(d, h, w, jnp.float32)[None] + fl
    planes = src.transpose(0, 4, 1, 2, 3).reshape(b * c, d, h, w)
    out = warp3d_planes_v3(
        planes, coords[..., 0], coords[..., 1], coords[..., 2], c, interpret=interpret
    )
    return out.reshape(b, c, d, h, w).transpose(0, 2, 3, 4, 1)


@pytest.mark.parametrize(
    "shape,c,amp,freq",
    [
        ((8, 16, 16), 1, 0.8, 1),
        ((10, 12, 10), 3, 2.0, 2),   # level-5 odd dims
        ((16, 24, 16), 8, 3.0, 2),   # channel batching
        ((12, 16, 140), 2, 1.5, 3),  # fw > 128 -> multi-chunk lanes
    ],
)
def test_matches_oracle(shape, c, amp, freq):
    src = jnp.asarray(RNG.standard_normal((1, *shape, c)).astype(np.float32))
    fl = smooth_flow(shape, amp, freq)
    ref = _warp_simple(src, fl)
    out = v3(src, fl)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=2e-5)


@pytest.mark.parametrize("shift", [4.75, -3.3])
def test_constant_shift_oob_zeros(shift):
    """Constant displacement: interior exact, outside-volume samples zero
    (grid_sample zeros padding). Negative shift exercises the HMARGIN
    (negative-t) path."""
    src = jnp.asarray(RNG.standard_normal((1, 12, 16, 16, 2)).astype(np.float32))
    fl = jnp.full((1, 12, 16, 16, 3), shift, jnp.float32)
    ref = _warp_simple(src, fl)
    out = v3(src, fl)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=2e-5)


def test_bf16_window():
    src = jnp.asarray(RNG.standard_normal((1, 12, 16, 16, 2)).astype(np.float32))
    fl = smooth_flow((12, 16, 16), 1.5, 2)
    ref = _warp_simple(src, fl)
    out = v3(src.astype(jnp.bfloat16), fl)
    assert out.dtype == jnp.float32
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=0.02)


def test_violations_guard():
    shape = (16, 16, 16)
    smooth = smooth_flow(shape, 1.5, 2)
    coords = base_grid(*shape, jnp.float32)[None] + smooth
    viol = warp_v3_window_violations(coords[..., 0], coords[..., 1], 16, 16)
    assert float(viol) == 0.0

    # alternating +-KD depth displacement exceeds the d spread budget
    wild = np.zeros((1, *shape, 3), np.float32)
    wild[:, :, ::2, :, 0] = KD
    wild[:, :, 1::2, :, 0] = -KD
    coords = base_grid(*shape, jnp.float32)[None] + jnp.asarray(wild)
    viol = warp_v3_window_violations(coords[..., 0], coords[..., 1], 16, 16)
    assert float(viol) > 0.5
