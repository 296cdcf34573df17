"""Benchmark: ModeT end-to-end inference latency per 160x192x160 LPBA pair.

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline"}.
value = per-pair latency (ms) of the jitted forward (moved, flow) on one chip.
vs_baseline = baseline_target_ms / measured_ms (>1 means faster than the
50 ms/v5p north-star from BASELINE.md).

Timing methodology: this environment's dispatch is async and
block_until_ready can return before real execution, so we time K forwards
with DISTINCT inputs inside one jit, materialize a scalar reduction of all
outputs to the host, and subtract the separately-measured host round-trip
overhead. Identical (program, input) executions are also served from a
cache here, hence the distinct inputs.
"""

import json
import time

import numpy as np

BASELINE_MS = 50.0
SHAPE = (160, 192, 160)
K = 8


def main():
    import jax
    import jax.numpy as jnp

    from smilecode_tpu.models import ModeT

    model = ModeT(qk_scale=1.0)
    rng = np.random.default_rng(0)
    movings = jnp.asarray(rng.random((K, 1, *SHAPE, 1), dtype=np.float64).astype(np.float32))
    fixed = jnp.asarray(rng.random((1, *SHAPE, 1), dtype=np.float64).astype(np.float32))
    params = model.init(jax.random.PRNGKey(0), movings[0], fixed)

    @jax.jit
    def rep(params, fixed, movs):
        # scan: the forward compiles ONCE (unrolled repeats explode compile
        # time here) and the carry serializes iterations (XLA interleaving
        # of independent forwards stacked intermediates to an HBM OOM)
        def body(acc, m):
            moved, flow = model.apply(params, m + acc * 0, fixed)
            return acc + jnp.sum(moved) + jnp.sum(flow[0, 0, 0]), ()

        acc, _ = jax.lax.scan(body, jnp.zeros((), jnp.float32), movs)
        return acc

    @jax.jit
    def trivial(x):
        return x * 1.0000001

    # warmups (compile)
    float(rep(params, fixed, movings))
    float(trivial(movings[0]).sum())

    overhead = []
    for _ in range(5):
        t0 = time.perf_counter()
        float(trivial(movings[0]).sum())
        overhead.append((time.perf_counter() - t0) * 1000)
    oh = float(np.median(overhead))

    times = []
    for _ in range(3):
        t0 = time.perf_counter()
        float(rep(params, fixed, movings))
        times.append((time.perf_counter() - t0) * 1000)
    per_pair = (float(np.median(times)) - oh) / K
    print(json.dumps({
        "metric": "modet_infer_ms_160x192x160",
        "value": round(per_pair, 3),
        "unit": "ms",
        "vs_baseline": round(BASELINE_MS / per_pair, 3),
    }))


if __name__ == "__main__":
    main()
