"""Benchmark: ModeT end-to-end inference latency per 160x192x160 LPBA pair.

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline"}.
value = p50 latency (ms) of the jitted forward (moved, flow) on one chip.
vs_baseline = baseline_target_ms / measured_ms (>1 means faster than the
50 ms/v5p north-star from BASELINE.md).
"""

import json
import time

import numpy as np

BASELINE_MS = 50.0
SHAPE = (160, 192, 160)
WARMUP = 2
ITERS = 10


def main():
    import jax
    import jax.numpy as jnp

    from smilecode_tpu.models import ModeT

    model = ModeT(qk_scale=1.0)
    rng = np.random.default_rng(0)
    moving = jnp.asarray(rng.random((1, *SHAPE, 1), dtype=np.float64).astype(np.float32))
    fixed = jnp.asarray(rng.random((1, *SHAPE, 1), dtype=np.float64).astype(np.float32))
    params = model.init(jax.random.PRNGKey(0), moving, fixed)

    fwd = jax.jit(lambda m, f: model.apply(params, m, f))
    for _ in range(WARMUP):
        out = fwd(moving, fixed)
        jax.block_until_ready(out)

    times = []
    for _ in range(ITERS):
        t0 = time.perf_counter()
        out = fwd(moving, fixed)
        jax.block_until_ready(out)
        times.append((time.perf_counter() - t0) * 1000)
    p50 = float(np.percentile(times, 50))
    print(json.dumps({
        "metric": "modet_infer_p50_ms_160x192x160",
        "value": round(p50, 3),
        "unit": "ms",
        "vs_baseline": round(BASELINE_MS / p50, 3),
    }))


if __name__ == "__main__":
    main()
