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

OOM robustness (round-1 failure was RESOURCE_EXHAUSTED, BENCH_r01.json):
each measurement attempt runs in a SUBPROCESS so a TPU OOM cannot poison
the retry; on failure we descend K (4 -> 2 -> 1). A fresh process also
releases all HBM between attempts.
"""

import json
import os
import subprocess
import sys
import time

BASELINE_MS = 50.0
SHAPE = (160, 192, 160)
K_LADDER = (4, 2, 1)


def measure(k: int) -> float:
    """Run the timing at repetition factor k; return per-pair ms."""
    import jax
    import jax.numpy as jnp
    import numpy as np

    from smilecode_tpu.models import ModeT

    model = ModeT(qk_scale=1.0)
    rng = np.random.default_rng(0)
    movings = jnp.asarray(rng.random((k, 1, *SHAPE, 1), dtype=np.float64).astype(np.float32))
    fixed = jnp.asarray(rng.random((1, *SHAPE, 1), dtype=np.float64).astype(np.float32))
    params = model.init(jax.random.PRNGKey(0), movings[0], fixed)

    def rep(params, fixed, movs):
        # scan: the forward compiles ONCE (unrolled repeats explode compile
        # time here) and the carry serializes iterations (XLA interleaving
        # of independent forwards stacked intermediates to an HBM OOM)
        def body(acc, m):
            moved, flow = model.apply(params, m + acc * 0, fixed)
            return acc + jnp.sum(moved) + jnp.sum(flow[0, 0, 0]), ()

        acc, _ = jax.lax.scan(body, jnp.zeros((), jnp.float32), movs)
        return acc

    rep = jax.jit(rep, donate_argnums=(2,))

    @jax.jit
    def trivial(x):
        return x * 1.0000001

    # warmups (compile); movs donated so re-materialize per call
    def run_once():
        movs = jnp.asarray(
            np.asarray(rng.random((k, 1, *SHAPE, 1)), dtype=np.float32))
        t0 = time.perf_counter()
        float(rep(params, fixed, movs))
        return (time.perf_counter() - t0) * 1000

    float(rep(params, fixed, movings))
    float(trivial(fixed).sum())

    overhead = []
    for _ in range(5):
        t0 = time.perf_counter()
        float(trivial(fixed).sum())
        overhead.append((time.perf_counter() - t0) * 1000)
    oh = float(np.median(overhead))

    times = [run_once() for _ in range(3)]
    return (float(np.median(times)) - oh) / k


def main():
    if len(sys.argv) > 1 and sys.argv[1] == "--measure":
        # child mode: one attempt, print a single float on success
        k = int(sys.argv[2])
        print("BENCH_RESULT %.6f" % measure(k), flush=True)
        return

    ladder = K_LADDER
    if os.environ.get("SMILECODE_BENCH_K"):
        ladder = (int(os.environ["SMILECODE_BENCH_K"]),)

    per_pair = None
    for k in ladder:
        proc = subprocess.run(
            [sys.executable, os.path.abspath(__file__), "--measure", str(k)],
            capture_output=True, text=True, timeout=3600,
        )
        for line in proc.stdout.splitlines():
            if line.startswith("BENCH_RESULT "):
                per_pair = float(line.split()[1])
                break
        if per_pair is not None:
            break
        sys.stderr.write(
            "bench attempt k=%d failed (rc=%d); tail:\n%s\n"
            % (k, proc.returncode, "\n".join(proc.stderr.splitlines()[-8:]))
        )

    if per_pair is None:
        # Still print a parseable line so the driver records the failure mode
        print(json.dumps({
            "metric": "modet_infer_ms_160x192x160",
            "value": None,
            "unit": "ms",
            "vs_baseline": 0.0,
        }))
        sys.exit(1)

    print(json.dumps({
        "metric": "modet_infer_ms_160x192x160",
        "value": round(per_pair, 3),
        "unit": "ms",
        "vs_baseline": round(BASELINE_MS / per_pair, 3),
    }))


if __name__ == "__main__":
    main()
