"""On-chip smoke + timing for every baseline model family (VERDICT r4 #3).

The reference ships 6 baseline families next to ModeT (SURVEY.md §2.2); all
have CPU torch-parity tests here but none had ever compiled or run on the
TPU. This module times one family's full inference forward at a given
resolution with the same discipline as bench.py `measure()` (distinct
inputs, scan-serialized in-jit repetition, host-overhead subtraction).

Reference smoke blocks: `/root/reference/Baseline methods/RCN/models.py:358-372`,
`RDN/models.py:980-995` (full-res single-forward `__main__` checks).

Run directly:  python -m benchmarks.baselines_bench <family> [k] [res]
with family in {im2grid, pcnet, prnet++, vtn, rcn, rdn}, res in {full, half}.
Called by bench.py --measure-baseline as an OOM-laddered subprocess.
"""

import json
import os
import sys
import time

os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/root/.jax_cache")

FULL = (160, 192, 160)
HALF = (80, 96, 80)
FAMILIES = ("im2grid", "pcnet", "prnet++", "vtn", "rcn", "rdn")


def measure_baseline(name: str, k: int = 2, res: str = "full") -> dict:
    import jax
    import jax.numpy as jnp
    import numpy as np

    from smilecode_tpu.config import InferConfig
    from smilecode_tpu.models.registry import build_model

    shape = FULL if res == "full" else HALF
    cfg = InferConfig(model=name, img_size=shape)  # rcn: n_cascade=10 default
    spec = build_model(name, cfg)

    rng = np.random.default_rng(0)
    movings = jnp.asarray(
        rng.random((k, 1, *shape, 1), dtype=np.float64).astype(np.float32))
    fixed = jnp.asarray(
        rng.random((1, *shape, 1), dtype=np.float64).astype(np.float32))
    params = spec.module.init(jax.random.PRNGKey(0), movings[0], fixed)

    def fwd(m):
        outs = spec.module.apply(params, m, fixed)
        # reduce every output so nothing is dead-code-eliminated
        return sum(jnp.sum(o) for o in jax.tree.leaves(outs))

    def rep(movs, fixed):
        def body(acc, m):
            m, _ = jax.lax.optimization_barrier((m, acc))
            return acc + fwd(m), ()

        acc, _ = jax.lax.scan(body, jnp.zeros((), jnp.float32), movs)
        return acc

    rep = jax.jit(rep)

    @jax.jit
    def trivial(x):
        return x * 1.0000001

    t0 = time.perf_counter()
    float(rep(movings, fixed))
    compile_s = time.perf_counter() - t0
    float(trivial(fixed).sum())

    overhead = []
    for _ in range(5):
        t0 = time.perf_counter()
        float(trivial(fixed).sum())
        overhead.append((time.perf_counter() - t0) * 1000)
    oh = float(np.median(overhead))

    times = []
    for _ in range(3):
        t0 = time.perf_counter()
        float(rep(movings, fixed))
        times.append((time.perf_counter() - t0) * 1000)
    med = float(np.median(times))
    return {
        "family": name,
        "res": res,
        "k": k,
        "per_pair_ms": (med - oh) / k,
        "compile_or_warm_s": round(compile_s, 1),
    }


if __name__ == "__main__":
    fam = sys.argv[1]
    k = int(sys.argv[2]) if len(sys.argv) > 2 else 2
    res = sys.argv[3] if len(sys.argv) > 3 else "full"
    if fam not in FAMILIES or res not in ("full", "half"):
        raise SystemExit(
            f"usage: python -m benchmarks.baselines_bench <{'|'.join(FAMILIES)}>"
            " [k] [full|half]")
    print("BENCH_RESULT " + json.dumps(measure_baseline(fam, k, res)), flush=True)
