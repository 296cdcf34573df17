"""Compile-time HBM analysis of the bench programs (no execution, no OOM
risk): prints XLA's temp/argument/peak sizes per configuration.

Usage: python -m benchmarks.mem_analysis [k] — compiles the flax-packed and
planes(-bf16) scan programs and reports jax's memory_analysis().
"""

from __future__ import annotations

import os
import sys

os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/root/.jax_cache")

import numpy as np

import jax
import jax.numpy as jnp


def analyze(name, fn, *args):
    try:
        compiled = jax.jit(fn).lower(*args).compile()
        ma = compiled.memory_analysis()
        gb = 1024 ** 3
        print(
            f"{name:18s}: temp {ma.temp_size_in_bytes / gb:6.2f} GB  "
            f"args {ma.argument_size_in_bytes / gb:5.2f} GB  "
            f"output {ma.output_size_in_bytes / gb:5.2f} GB  "
            f"gen-code {ma.generated_code_size_in_bytes / 1024**2:.0f} MB"
        )
    except Exception as e:  # noqa: BLE001 - report and continue
        print(f"{name:18s}: FAILED {type(e).__name__}: {str(e)[:300]}")


def main(k: int = 2):
    from smilecode_tpu.models import ModeT
    from smilecode_tpu.models.modet_planes import modet_forward_planes

    shape = (160, 192, 160)
    rng = np.random.default_rng(0)
    movings = jnp.asarray(rng.random((k, 1, *shape, 1), dtype=np.float64).astype(np.float32))
    fixed = jnp.asarray(rng.random((1, *shape, 1), dtype=np.float64).astype(np.float32))
    model = ModeT(qk_scale=1.0)
    params = jax.eval_shape(
        lambda: model.init(jax.random.PRNGKey(0), movings[0], fixed)
    )
    params = jax.tree.map(lambda s: jnp.zeros(s.shape, s.dtype), params)

    def make_rep(fwd):
        def rep(params, fixed, movs):
            def body(acc, m):
                m, _ = jax.lax.optimization_barrier((m, acc))
                moved, flow = fwd(params, m, fixed)
                return acc + jnp.sum(moved) + jnp.sum(flow[0, 0, 0]), ()

            acc, _ = jax.lax.scan(body, jnp.zeros((), jnp.float32), movs)
            return acc

        return rep

    from smilecode_tpu.ops import warp as warp_mod

    warp_mod.WARP_IMPL = "packed"
    analyze("flax-packed", make_rep(lambda p, m, f: model.apply(p, m, f)),
            params, fixed, movings)

    analyze(
        "planes",
        make_rep(lambda p, m, f: modet_forward_planes(p, m, f, qk_scale=1.0, guarded_warp=False)),
        params, fixed, movings,
    )
    analyze(
        "planes-bf16",
        make_rep(lambda p, m, f: modet_forward_planes(
            p, m, f, qk_scale=1.0, guarded_warp=False, compute_dtype="bfloat16")),
        params, fixed, movings,
    )


if __name__ == "__main__":
    main(int(sys.argv[1]) if len(sys.argv) > 1 else 2)
