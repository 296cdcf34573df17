"""Device-trace breakdown of the planes forward (one chip, 2 iters).

Usage: python -m benchmarks.trace_planes [planes|flax] [f32|bf16]
Prints per-op-category device-time sums from the profiler trace.
"""

from __future__ import annotations

import glob
import gzip
import json
import os
import sys

os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/root/.jax_cache")

import numpy as np

import jax
import jax.numpy as jnp


def run(which: str = "planes", dtype: str = "f32"):
    from smilecode_tpu.models import ModeT
    from smilecode_tpu.models.modet_planes import modet_forward_planes

    shape = (160, 192, 160)
    rng = np.random.default_rng(0)
    mv = jnp.asarray(rng.random((1, *shape, 1), dtype=np.float64).astype(np.float32))
    fx = jnp.asarray(rng.random((1, *shape, 1), dtype=np.float64).astype(np.float32))
    model = ModeT(qk_scale=1.0)
    params = model.init(jax.random.PRNGKey(0), mv, fx)

    cd = "bfloat16" if dtype == "bf16" else None
    if which == "planes":
        fwd = jax.jit(lambda p, m, f: modet_forward_planes(
            p, m, f, qk_scale=1.0, guarded_warp=False, compute_dtype=cd))
    else:
        fwd = jax.jit(lambda p, m, f: model.apply(p, m, f))

    # compile + settle
    out = fwd(params, mv, fx)
    float(jnp.sum(out[1]))

    logdir = "/tmp/trace_planes"
    os.system(f"rm -rf {logdir}")
    jax.profiler.start_trace(logdir)
    for _ in range(2):
        out = fwd(params, mv, fx)
        float(jnp.sum(out[1]))
    jax.profiler.stop_trace()

    # parse the trace proto-agnostically via the .json.gz trace events
    paths = glob.glob(f"{logdir}/**/*.trace.json.gz", recursive=True)
    if not paths:
        print("no trace file found", glob.glob(f"{logdir}/**/*", recursive=True)[:10])
        return
    with gzip.open(paths[0], "rt") as f:
        trace = json.load(f)
    events = [e for e in trace.get("traceEvents", [])
              if e.get("ph") == "X" and e.get("dur")]
    # keep device-side lanes only (TensorCore pids)
    names = {}
    for e in events:
        nm = e.get("name", "")
        if nm.startswith(("Thread", "process_")):
            continue
        names.setdefault(nm, 0.0)
        names[nm] += e["dur"] / 1000.0  # ms total over 2 iters

    def bucket(nm: str) -> str:
        n = nm.lower()
        if "custom-call" in n or "warp" in n or "tpu_custom_call" in n:
            return "pallas-kernels"
        if n.startswith("copy") or ".copy" in n:
            return "copy"
        if n.startswith(("reshape", "bitcast", "transpose")):
            return "reshape/transpose"
        if n.startswith(("concatenate", "pad", "select", "dynamic-update")):
            return "concat/pad/select"
        if n.startswith(("fusion", "loop_", "input_", "output_")):
            return "fusion"
        if n.startswith(("convolution", "conv", "dot", "cublas")):
            return "conv/dot"
        if n.startswith(("reduce", "all-")):
            return "reduce"
        return "other"

    buckets = {}
    for nm, ms in names.items():
        buckets.setdefault(bucket(nm), [0.0, 0])
        buckets[bucket(nm)][0] += ms / 2.0  # per iter
        buckets[bucket(nm)][1] += 1
    print(f"== {which} {dtype}: device ms/iter by category")
    for k, (ms, n) in sorted(buckets.items(), key=lambda kv: -kv[1][0]):
        print(f"  {k:20s} {ms:8.1f} ms  ({n} ops)")
    top = [kv for kv in sorted(names.items(), key=lambda kv: -kv[1])
           if not any(s in kv[0] for s in ("array.py", "profiler", "asarray", "jit__", "stop_trace", "Steps", "$"))][:40]
    print("-- top ops (ms over 2 iters):")
    for nm, ms in top:
        print(f"  {ms:8.1f}  {nm[:110]}")


if __name__ == "__main__":
    run(sys.argv[1] if len(sys.argv) > 1 else "planes",
        sys.argv[2] if len(sys.argv) > 2 else "f32")
