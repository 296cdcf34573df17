"""Per-op benchmarks of the planes-decoder NON-kernel pieces at LPBA shapes.

The v3 warps and the fused attention now have their own benches; this one
targets everything else in `models/modet_planes.py` — projections+LN, CWM
blocks, upsampling, transposes, flow-compose arithmetic — to find where the
rest of the e2e time goes.

Usage: python -m benchmarks.planes_decoder_bench [f32|bf16|all]
"""

from __future__ import annotations

import os
import sys

os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/root/.jax_cache")

import numpy as np

import jax
import jax.numpy as jnp

from benchmarks.timing import bench_op, measure_overhead

RNG = np.random.default_rng(0)
S = (160, 192, 160)

# (level, res, feat_C, heads); hd=6 everywhere (ModeT defaults)
LEVELS = [
    (1, (160, 192, 160), 4, 1),
    (2, (80, 96, 80), 8, 1),
    (3, (40, 48, 40), 16, 2),
]


def _planes(c, shape, dtype):
    return jnp.asarray(
        RNG.random((1, c, *shape), dtype=np.float64).astype(np.float32)
    ).astype(dtype)


def _proj_params(cin, heads, hd):
    co = heads * hd
    return {
        "proj": {
            "kernel": jnp.asarray(RNG.standard_normal((cin, co)).astype(np.float32)),
            "bias": jnp.zeros((co,), jnp.float32),
        },
        "norm": {
            "scale": jnp.ones((co,), jnp.float32),
            "bias": jnp.zeros((co,), jnp.float32),
        },
    }


def _cwm_params(heads):
    cin = heads * 3

    def conv(ci, co):
        return {"main": {
            "kernel": jnp.asarray(
                RNG.standard_normal((3, 3, 3, ci, co)).astype(np.float32) * 0.1
            ),
            "bias": jnp.zeros((co,), jnp.float32),
        }}

    return {
        "conv_0": conv(cin, cin),
        "conv_1": conv(cin, cin),
        "conv_2": {
            "kernel": jnp.asarray(
                RNG.standard_normal((3, 3, 3, cin, heads)).astype(np.float32) * 0.1
            ),
            "bias": jnp.zeros((heads,), jnp.float32),
        },
    }


def main(which: str = "all"):
    from smilecode_tpu.models.modet_planes import (
        proj_ln_planes, cwm_planes, upsample2_planes, to_planes, from_planes,
    )

    oh = measure_overhead()
    print(f"host overhead {oh:.1f} ms")
    dtypes = {"f32": jnp.float32, "bf16": jnp.bfloat16}
    if which != "all":
        dtypes = {which: dtypes[which]}

    for name, dt in dtypes.items():
        hd = 6
        for lvl, res, c, heads in LEVELS:
            p = _proj_params(c, heads, hd)
            ms = bench_op(
                lambda x: proj_ln_planes(p, x, heads, hd),
                lambda: [_planes(c, res, dt)], k=3, overhead_ms=oh,
            )
            print(f"proj_ln L{lvl} {res} C={c} h={heads} {name}: {ms:8.2f} ms")

        # CWM blocks: input at the level's res, upsampled 2x inside
        for lvl, res, heads in ((5, (10, 12, 10), 8), (4, (20, 24, 20), 4),
                                (3, (40, 48, 40), 2)):
            p = _cwm_params(heads)
            ms = bench_op(
                lambda x: cwm_planes(p, x, heads),
                lambda: [_planes(heads * 3, res, dt)], k=3, overhead_ms=oh,
            )
            print(f"cwm L{lvl} {res}->2x h={heads} {name}: {ms:8.2f} ms")

        # flow upsample to full res (always f32 in the model)
        ms = bench_op(
            upsample2_planes, lambda: [_planes(3, (80, 96, 80), jnp.float32)],
            k=3, overhead_ms=oh,
        )
        print(f"upsample2 flow (80,96,80)->full f32: {ms:8.2f} ms")

        # transposes at full res
        for c in (1, 4):
            ms = bench_op(
                lambda x: to_planes(x),
                lambda: [jnp.asarray(
                    RNG.random((1, *S, c), dtype=np.float64).astype(np.float32)
                ).astype(dt)],
                k=3, overhead_ms=oh,
            )
            print(f"to_planes full-res C={c} {name}: {ms:8.2f} ms")
        ms = bench_op(
            lambda x: from_planes(x), lambda: [_planes(3, S, dt)],
            k=3, overhead_ms=oh,
        )
        print(f"from_planes full-res C=3 {name}: {ms:8.2f} ms")

        # flow-compose arithmetic a + b and 2*x casts at full res (f32)
        ms = bench_op(
            lambda a, b: a + b,
            lambda: [_planes(3, S, jnp.float32), _planes(3, S, jnp.float32)],
            k=3, overhead_ms=oh,
        )
        print(f"flow add full-res f32: {ms:8.2f} ms")

        # s2d encoder at full res for reference
        from smilecode_tpu.ops.encoder_s2d import encoder_s2d_apply
        from smilecode_tpu.models.modet import Encoder

        enc = Encoder(first_out_channel=4)
        vol = jnp.asarray(RNG.random((1, *S, 1), dtype=np.float64).astype(np.float32))
        ep = enc.init(jax.random.PRNGKey(0), vol)["params"]
        ms = bench_op(
            lambda v: [x.astype(jnp.float32) for x in encoder_s2d_apply(
                ep, v.astype(dt), first_out_channel=4)],
            lambda: [jnp.asarray(
                RNG.random((1, *S, 1), dtype=np.float64).astype(np.float32))],
            k=2, overhead_ms=oh,
        )
        print(f"encoder s2d full-res {name}: {ms:8.2f} ms")


if __name__ == "__main__":
    main(sys.argv[1] if len(sys.argv) > 1 else "all")
