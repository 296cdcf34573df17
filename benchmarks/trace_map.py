"""Trace the planes forward on-chip AND map hot trace ops -> HLO source.

The round-3 perf model has a ~48 ms "unmapped XLA fusion/copy block"
(ROUND_NOTES.md): trace op names like `fusion.2311` with no source
attribution. This script closes the loop: it dumps optimized HLO from the
SAME process/compile that the profiler traces (so fusion numbering matches),
aggregates the top trace ops, and greps each hot op's `metadata=` line
(op_name + source_file:line) out of the dump.

Usage: python -m benchmarks.trace_map [f32|bf16] [fwd|train] [guard|noguard]
``noguard`` (default) matches bench.py's headline row (guarded_warp=False —
near-zero bench flows make the kernels exact and the guard's fallback branch
would only reserve cond temps); ``guard`` traces the production infer config.
Artifacts: /tmp/xdump (HLO text), /tmp/trace_planes_map (profile).
"""
import glob
import gzip
import json
import os
import re
import sys

os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/root/.jax_cache")
os.environ["XLA_FLAGS"] = (
    os.environ.get("XLA_FLAGS", "")
    + " --xla_dump_to=/tmp/xdump --xla_dump_hlo_as_text"
    + " --xla_dump_hlo_pass_re=NONEXISTENT"
)
os.system("rm -rf /tmp/xdump")

import numpy as np
import jax
import jax.numpy as jnp

from smilecode_tpu.models import ModeT
from smilecode_tpu.models.modet_planes import modet_forward_planes

SHAPE = (160, 192, 160)
RNG = np.random.default_rng(0)


def main():
    dtype = sys.argv[1] if len(sys.argv) > 1 else "bf16"
    mode = sys.argv[2] if len(sys.argv) > 2 else "fwd"
    guard_arg = sys.argv[3] if len(sys.argv) > 3 else "noguard"
    # reject typos instead of silently tracing the wrong config
    usage = "usage: python -m benchmarks.trace_map [f32|bf16] [fwd|train] [guard|noguard]"
    if dtype not in ("f32", "bf16") or mode not in ("fwd", "train") \
            or guard_arg not in ("guard", "noguard"):
        raise SystemExit(f"unrecognized args {sys.argv[1:]}\n{usage}")
    guarded = guard_arg == "guard"
    cd = jnp.bfloat16 if dtype == "bf16" else None

    model = ModeT(qk_scale=1.0)
    small = jnp.zeros((1, 16, 16, 16, 1), jnp.float32)
    params = jax.jit(model.init)(jax.random.PRNGKey(0), small, small)

    if mode == "train":
        from smilecode_tpu.losses.core import grad3d, ncc_vxm

        def loss(p, m, f):
            moved, flow = modet_forward_planes(
                p, m, f, qk_scale=1.0, compute_dtype=cd, guarded_warp=guarded
            )
            return ncc_vxm(f, moved) + grad3d(flow, penalty="l2")

        vg = jax.value_and_grad(loss)

        def run(p, m, f):
            l, g = vg(p, m, f)
            return l, g["params"]["proj0"]["kernel"]

        fwd = jax.jit(run)
    else:
        fwd = jax.jit(
            lambda p, m, f: modet_forward_planes(
                p, m, f, qk_scale=1.0, compute_dtype=cd, guarded_warp=guarded
            )
        )

    def vol():
        return jnp.asarray(RNG.random((1, *SHAPE, 1)).astype(np.float32))

    m0, f0 = vol(), vol()
    out = fwd(params, m0, f0)
    print("warmup out[1] mean", float(jnp.abs(jax.tree.leaves(out)[1]).mean()),
          flush=True)

    # optimized HLO straight from the loaded executable: works even when the
    # compile was served from the persistent cache (in which case the
    # --xla_dump_to path above produces NOTHING — observed round 5)
    hlo_text = ""
    try:
        compiled = fwd.lower(params, m0, f0).compile()
        hlo_text = "\n".join(
            m.to_string() for m in compiled.runtime_executable().hlo_modules()
        )
    except Exception as e:  # fall back to the dump dir
        print("executable hlo fetch failed:", e)

    logdir = "/tmp/trace_planes_map"
    os.system(f"rm -rf {logdir}")
    jax.profiler.start_trace(logdir)
    for _ in range(3):
        mv, fx = vol(), vol()
        r = fwd(params, mv, fx)
        float(jnp.sum(jax.tree.leaves(r)[0]))
    jax.profiler.stop_trace()

    paths = glob.glob(f"{logdir}/**/*.trace.json.gz", recursive=True)
    with gzip.open(paths[0], "rt") as fh:
        trace = json.load(fh)
    # keep DEVICE-track events only: host python frames ($file:line names,
    # PjitFunction, np.asarray, ...) flooded the round-5 first aggregation.
    # Device tracks are the pids whose process_name metadata mentions the
    # TPU/device; fall back to dropping $-prefixed + known-host names.
    dev_pids = set()
    for e in trace.get("traceEvents", []):
        if e.get("ph") == "M" and e.get("name") == "process_name":
            pname = (e.get("args") or {}).get("name", "")
            if any(s in pname for s in ("TPU", "/device", "Device", "XLA")):
                dev_pids.add(e.get("pid"))
    agg = {}
    for e in trace.get("traceEvents", []):
        if e.get("ph") != "X" or "dur" not in e:
            continue
        name = e.get("name", "")
        if dev_pids:
            if e.get("pid") not in dev_pids:
                continue
        elif name.startswith("$") or "(" in name or name.startswith("np."):
            continue
        agg[name] = agg.get(name, 0) + e["dur"]
    top = sorted(agg.items(), key=lambda kv: -kv[1])[:45]

    if not hlo_text:
        for p in glob.glob("/tmp/xdump/*after_optimizations*.txt"):
            hlo_text += open(p).read()
    print(f"hlo text bytes: {len(hlo_text)}")

    def meta_for(op):
        m = re.search(rf"%{re.escape(op)} = [^\n]*", hlo_text)
        if not m:
            return ""
        line = m.group(0)
        src = re.search(r'source_file="([^"]+)" source_line=(\d+)', line)
        opn = re.search(r'op_name="([^"]+)"', line)
        parts = []
        if opn:
            parts.append(opn.group(1)[:90])
        if src:
            parts.append(f"{src.group(1).split('/')[-1]}:{src.group(2)}")
        return " | ".join(parts)

    total = sum(agg.values())
    print(f"total device us/3: {total / 3:.0f}")
    for name, us in top:
        print(f"{us / 1000 / 3:8.2f} ms  {name[:40]:40s}  {meta_for(name)}",
              flush=True)


if __name__ == "__main__":
    main()
