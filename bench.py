"""Benchmark: ModeT end-to-end inference latency per 160x192x160 LPBA pair.

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline", ...}.
value = per-pair latency (ms) of the jitted forward (moved, flow) on one chip.
vs_baseline = baseline_target_ms / measured_ms (>1 means faster than the
50 ms/v5p north-star from BASELINE.md).

Timing methodology: this environment's dispatch is async and
block_until_ready can return before real execution, so we time K forwards
with DISTINCT inputs inside one jit, materialize a scalar reduction of all
outputs to the host, and subtract the separately-measured host round-trip
overhead. Identical (program, input) executions are also served from a
cache here, hence the distinct inputs.

Ladder economics (round-3 post-mortem, BENCH_r03.json rc=124): the old
ladder ran the speculative bf16 attempt FIRST with a full-res parity gate
inside the measuring child, so one gate trip burned two full-model TPU
compiles before any number existed, and the driver's wall clock ran out
with nothing banked. This version:

  1. BANKS a cheap f32 planes number first (the compile the persistent
     cache is most likely to already hold);
  2. only then attempts upgrades (bf16) and extra rows (train step,
     production config), each in its own subprocess, each skippable;
  3. the bf16 parity gate runs in its OWN child at HALF resolution with
     guarded warps (production semantics; the old full-res unguarded gate
     measured v4 window-clamp artifacts, not bf16 numerics — see
     tests/test_modet_planes.py::test_bf16_vs_f32_with_kernels) — a trip
     costs one half-res compile, not two full-res;
  4. a global self-budget (SMILECODE_BENCH_BUDGET_S, default 1700 s — the
     round-4 driver SIGTERMed the whole process at 1797 s, so the default
     must come in under 1800 with margin) stops starting new phases when
     low, and a SIGTERM handler prints the banked JSON line if the driver
     times the whole process out anyway.

OOM robustness (round-1 failure was RESOURCE_EXHAUSTED, BENCH_r01.json):
each measurement attempt runs in a SUBPROCESS so a TPU OOM cannot poison
the retry; on failure we descend K (2 -> 1). A fresh process also releases
all HBM between attempts.
"""

import json
import os
import signal
import subprocess
import sys
import time

# persistent XLA compilation cache: full-model compiles via the remote
# compile helper take 10-20+ min; cached reloads take seconds. Inherited by
# the --measure subprocesses through the environment.
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/root/.jax_cache")

BASELINE_MS = 50.0
SHAPE = (160, 192, 160)
GATE_SHAPE = (80, 96, 80)  # half-res: level-1 still crosses _V4_MIN_VOXELS
# (repetition factor K, impl): "planes" = the planes-layout decoder +
# s2d-resident encoder (models/modet_planes.py) — the production inference
# path, equality-tested against the reference-parity flax graph (2e-4).
# Fallbacks descend K and then the older flax configs ("packed" row-gather
# warps, "pallas" windowed warps — least HBM).
F32_ATTEMPTS = (
    (2, "planes"),
    (1, "planes"),
    (2, "packed"),
    (1, "packed"),
    (1, "pallas"),
)


def _smooth_vol(seed, shape):
    import jax
    import jax.numpy as jnp
    import numpy as np

    r = np.random.default_rng(seed)
    low = r.random((20, 24, 20)).astype(np.float32)
    v = jax.image.resize(jnp.asarray(low), shape, "linear")
    v = (v - v.min()) / (v.max() - v.min())
    return v[None, ..., None]


def _excite_params(params):
    """Perturb projection/rpb params so flows are non-trivial (init weights
    produce near-zero flows). Same recipe as
    tests/test_modet.py::test_bf16_compute_matches_f32."""
    import jax

    def excite(path, x):
        name = "/".join(str(getattr(k, "key", k)) for k in path)
        if "proj/kernel" in name or "rpb" in name:
            return x + jax.random.normal(jax.random.PRNGKey(len(name)), x.shape) * 0.1
        return x

    return jax.tree_util.tree_map_with_path(excite, params)


def bf16_parity_gate(full_res: bool = False) -> None:
    """Assert the bf16 planes forward stays within the f32 flow-endpoint
    bounds of tests/test_modet.py::test_bf16_compute_matches_f32, on smooth
    brain-like volumes.

    Default: HALF resolution, guarded_warp=True, excited projection/rpb
    params — the cheap pre-upgrade gate. The round-3 gate ran full-res with
    guarded=False, where the excited flows exceed the v4 kernel's per-plane
    d-spread budget and clamp SILENTLY; the resulting p99=0.33 was a
    window-clamp artifact, not bf16 numerics (the guard exists exactly to
    route such flows to exact kernels). Raises on failure, which fails this
    subprocess and keeps the banked f32 number.

    full_res=True (VERDICT r4 #6): the same guarded gate at FULL resolution
    with the trained production checkpoint (benchmarks/prod_ckpt.npz) when
    present — the on-chip full-res anchor for the bf16 evidence chain.
    Stats ride the bench JSON either way (GATE_STATS line)."""
    import jax
    import numpy as np

    from smilecode_tpu.models import ModeT
    from smilecode_tpu.models.modet_planes import modet_forward_planes

    shape = SHAPE if full_res else GATE_SHAPE
    model = ModeT(qk_scale=1.0)
    moving, fixed = _smooth_vol(1, shape), _smooth_vol(2, shape)
    params = model.init(jax.random.PRNGKey(0), moving, fixed)
    ckpt = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                        "benchmarks", "prod_ckpt.npz")
    if full_res and os.path.exists(ckpt):
        import numpy as _np

        from benchmarks.make_prod_ckpt import unflatten_into
        params = unflatten_into(params, dict(_np.load(ckpt)))
        src = "prod_ckpt"
    else:
        params = _excite_params(params)
        src = "excited"
    fwd = jax.jit(
        lambda p, m, f, dt: modet_forward_planes(
            p, m, f, qk_scale=1.0, guarded_warp=True, compute_dtype=dt
        ),
        static_argnums=(3,),
    )
    _, flow32 = fwd(params, moving, fixed, None)
    _, flow16 = fwd(params, moving, fixed, "bfloat16")
    err = np.abs(np.asarray(flow16) - np.asarray(flow32))
    assert float(np.abs(np.asarray(flow32)).max()) > 0.05, "gate flows degenerate"
    mean, p99 = float(err.mean()), float(np.percentile(err, 99))
    print("GATE_STATS " + json.dumps({
        "res": "full" if full_res else "half", "params": src,
        "flow_err_mean": round(mean, 5), "flow_err_p99": round(p99, 5),
    }), flush=True)
    print(f"bf16 parity gate: flow err mean={mean:.4f} p99={p99:.4f}",
          file=sys.stderr, flush=True)
    assert mean < 0.06 and p99 < 0.3, f"bf16 gate tripped: mean={mean} p99={p99}"
    print("GATE_OK", flush=True)


def measure(k: int, impl: str = "packed") -> dict:
    """Run the timing at repetition factor k; return per-pair stats.

    impl: "packed" / "pallas" select the warp path of the flax model;
    "planes" runs the planes-layout decoder (models/modet_planes.py);
    "planes-bf16" additionally runs the feature path in bfloat16 (gate runs
    separately in the parent's ladder); "planes-prod" is the PRODUCTION
    inference configuration — guarded warps + excited params, i.e. real-
    checkpoint-like non-trivial flows where the warp guard actually pays
    its violation checks and possible fallbacks (VERDICT r3 weak #4).
    """
    import jax
    import jax.numpy as jnp
    import numpy as np

    from smilecode_tpu.models import ModeT

    model = ModeT(qk_scale=1.0)
    rng = np.random.default_rng(0)
    movings = jnp.asarray(rng.random((k, 1, *SHAPE, 1), dtype=np.float64).astype(np.float32))
    fixed = jnp.asarray(rng.random((1, *SHAPE, 1), dtype=np.float64).astype(np.float32))
    params = model.init(jax.random.PRNGKey(0), movings[0], fixed)

    if impl.startswith("planes"):
        from smilecode_tpu.models.modet_planes import modet_forward_planes

        prod = "prod" in impl
        if prod:
            # realistic params: a briefly-TRAINED checkpoint when available
            # (benchmarks/make_prod_ckpt.py) — trained flows are smooth with
            # +-3..10 voxel magnitude, the regime real checkpoints produce
            # and the guard ladder's kernels serve. Excited params are only
            # the fallback: their flows are softmax tie-breaking noise
            # (rough +-11 voxels at ANY excitation scale), which no windowed
            # kernel can serve — that row measures the oracle, i.e. a
            # worst-case bound, not production.
            ckpt = os.path.join(
                os.path.dirname(os.path.abspath(__file__)),
                "benchmarks", "prod_ckpt.npz",
            )
            if os.path.exists(ckpt):
                from benchmarks.make_prod_ckpt import unflatten_into
                params = unflatten_into(params, dict(np.load(ckpt)))
                print("prod row: loaded trained checkpoint", file=sys.stderr)
            else:
                params = _excite_params(params)
                print("prod row: no checkpoint; excited params (worst-case)",
                      file=sys.stderr)
            # smooth brain-like volumes: realistic image content
            movings = jnp.stack([_smooth_vol(10 + i, SHAPE) for i in range(k)])
            fixed = _smooth_vol(2, SHAPE)

        # guarded=False on the headline: bench flows are near-zero (init
        # weights) => zero window violations => the v3/v4 kernels are exact
        # here and the guard's fallback branch would only reserve its temps
        # (cond allocates max-of-branches). The "planes-prod" row keeps
        # guarded=True like infer.py.
        def fwd(params, m, f):
            return modet_forward_planes(
                params, m, f, qk_scale=1.0, guarded_warp=prod,
                compute_dtype="bfloat16" if "bf16" in impl else None,
            )
    else:
        from smilecode_tpu.ops import warp as warp_mod

        warp_mod.WARP_IMPL = impl

        def fwd(params, m, f):
            return model.apply(params, m, f)

    def rep(params, fixed, movs):
        # scan: the forward compiles ONCE (unrolled repeats explode compile
        # time here) and the carry serializes iterations (XLA interleaving
        # of independent forwards stacked intermediates to an HBM OOM)
        def body(acc, m):
            # serialize iterations without copying m (an `+acc*0` add forced
            # a full-volume copy in a padded layout)
            m, _ = jax.lax.optimization_barrier((m, acc))
            moved, flow = fwd(params, m, fixed)
            return acc + jnp.sum(moved) + jnp.sum(flow[0, 0, 0]), ()

        acc, _ = jax.lax.scan(body, jnp.zeros((), jnp.float32), movs)
        return acc

    # NB: no donation and no per-call re-upload — host->device transfer over
    # the tunnel is slow enough (tens of MB) to dominate the measurement if
    # inputs are recreated per timed call (the round-2 try-2 bench measured
    # 2353 ms/pair purely from re-uploading donated inputs each call).
    rep = jax.jit(rep)

    @jax.jit
    def trivial(x):
        return x * 1.0000001

    def run_once():
        t0 = time.perf_counter()
        float(rep(params, fixed, movings))
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
    med = float(np.median(times))
    return {
        "per_pair_ms": (med - oh) / k,
        # p50 per-pair latency as a user would see it: one dispatch+host
        # round trip amortized over the k pairs of the scan
        "p50_pair_ms": med / k,
        "pairs_per_sec_per_chip": 1000.0 * k / med,
    }


def measure_warps(k: int = 2) -> dict:
    """Guarded-warp-ladder cost on smooth REALISTIC flows, per warp site of
    the planes forward, summed. This is the production-relevant warp number
    that needs no trained checkpoint: the warp kernels take explicit flows,
    so we inject smooth +-4-voxel fields (scaled per level to the same
    physical deformation) — the regime real checkpoints produce — through
    `warp_planes(guarded=True)` at every (shape, C) site of
    `modet_forward_planes` (models/modet_planes.py:466-493). The e2e prod
    row with excited params measures softmax tie-breaking NOISE flows (an
    oracle-fallback worst case); this row measures the intended regime."""
    import jax
    import jax.numpy as jnp
    import numpy as np

    from smilecode_tpu.models.modet_planes import warp_planes

    full = SHAPE
    # (D, H, W, C) of every warp site in the full-res planes forward, in
    # graph order: m4w, compose@1/4, m3w, compose@1/2, m2w, w2-compose@1/2,
    # m1w, w1-compose@full, final image warp
    sites = [
        ((20, 24, 20), 64),
        ((40, 48, 40), 3),
        ((40, 48, 40), 32),
        ((80, 96, 80), 3),
        ((80, 96, 80), 16),
        ((80, 96, 80), 3),
        (full, 8),
        (full, 3),
        (full, 1),
    ]
    rng = np.random.default_rng(3)

    def smooth_flow(seed, shape, amp):
        r = np.random.default_rng(seed)
        low = r.standard_normal((3, 10, 12, 10)).astype(np.float32)
        f = jax.image.resize(jnp.asarray(low), (3, *shape), "linear")
        return (f / (jnp.abs(f).max() + 1e-9) * amp)[None]  # (1,3,D,H,W)

    srcs = [
        jnp.asarray(rng.random((1, c, *s), dtype=np.float64).astype(np.float32))
        for s, c in sites
    ]
    # k distinct flow sets per site; amp scales with resolution (same
    # physical deformation fraction at every level)
    flows = [
        jnp.stack([
            smooth_flow(97 + 13 * i + j, s, 4.0 * s[0] / full[0])
            for j in range(k)
        ])
        for i, (s, c) in enumerate(sites)
    ]

    def rep(srcs, flows):
        def body(acc, fls):
            tot = acc
            for src, fl in zip(srcs, fls):
                src, _ = jax.lax.optimization_barrier((src, tot))
                out = warp_planes(src, fl, on_tpu=True, guarded=True)
                tot = tot + jnp.sum(out[:, 0, 0, 0, :8])
            return tot, ()

        acc, _ = jax.lax.scan(body, jnp.zeros((), jnp.float32), tuple(flows))
        return acc

    rep = jax.jit(rep)

    @jax.jit
    def trivial(x):
        return x * 1.0000001

    float(rep(srcs, flows))
    float(trivial(srcs[-1]).sum())
    overhead = []
    for _ in range(5):
        t0 = time.perf_counter()
        float(trivial(srcs[-1]).sum())
        overhead.append((time.perf_counter() - t0) * 1000)
    oh = float(np.median(overhead))

    times = []
    for _ in range(3):
        t0 = time.perf_counter()
        float(rep(srcs, flows))
        times.append((time.perf_counter() - t0) * 1000)
    med = float(np.median(times))
    return {"warps_ms": (med - oh) / k}


def measure_train(k: int, remat: bool = False) -> dict:
    """Full training step (fwd + NCC + Grad3d + bwd + amsgrad) at full res
    through the planes graph (the production TPU training path,
    `train.py fast_path=planes`): fused attention backward + v3/v4 warp
    adjoint. Returns ms/step stats. Same timing discipline as measure():
    distinct inputs, scan-serialized in-jit repetition, host-overhead
    subtraction.

    remat=True wraps the loss in jax.checkpoint: the k=2 scan pathology
    (XLA unrolls a 2-trip scan and co-allocates BOTH iterations' backward
    activations -> HBM paging, 7562 ms/step measured 2026-08-19) is a
    buffer-lifetime problem; remat shrinks the saved-activation set so the
    co-allocated footprint fits."""
    import jax
    import jax.numpy as jnp
    import numpy as np
    import optax

    from smilecode_tpu.models import ModeT
    from smilecode_tpu.models.modet_planes import modet_forward_planes
    from smilecode_tpu.losses import ncc_vxm, grad3d

    model = ModeT(qk_scale=1.0)
    rng = np.random.default_rng(0)
    movings = jnp.asarray(rng.random((k, 1, *SHAPE, 1), dtype=np.float64).astype(np.float32))
    fixed = jnp.asarray(rng.random((1, *SHAPE, 1), dtype=np.float64).astype(np.float32))
    params = model.init(jax.random.PRNGKey(0), movings[0], fixed)
    tx = optax.amsgrad(1e-4)
    opt_state = tx.init(params)

    def loss_fn(p, m, f):
        moved, flow = modet_forward_planes(
            p, m, f, qk_scale=1.0, guarded_warp=False
        )
        return ncc_vxm(moved, f) + grad3d(flow, penalty="l2")

    if remat:
        loss_fn = jax.checkpoint(loss_fn)

    def rep(params, opt_state, fixed, movs):
        def body(carry, m):
            # the params carry is a true data dependency: iterations cannot
            # interleave (no optimization_barrier needed here)
            params, opt_state = carry
            loss, grads = jax.value_and_grad(loss_fn)(params, m, fixed)
            updates, opt_state = tx.update(grads, opt_state, params)
            params = optax.apply_updates(params, updates)
            return (params, opt_state), loss

        (params, opt_state), losses = jax.lax.scan(
            body, (params, opt_state), movs
        )
        return jnp.sum(losses)

    rep = jax.jit(rep)

    @jax.jit
    def trivial(x):
        return x * 1.0000001

    float(rep(params, opt_state, fixed, movings))
    float(trivial(fixed).sum())

    overhead = []
    for _ in range(5):
        t0 = time.perf_counter()
        float(trivial(fixed).sum())
        overhead.append((time.perf_counter() - t0) * 1000)
    oh = float(np.median(overhead))

    def run_once():
        t0 = time.perf_counter()
        float(rep(params, opt_state, fixed, movings))
        return (time.perf_counter() - t0) * 1000

    times = [run_once() for _ in range(3)]
    med = float(np.median(times))
    return {"per_step_ms": (med - oh) / k}


def _run_child(args, timeout):
    """subprocess.run that treats a timeout like any failed attempt instead
    of raising (an unhandled TimeoutExpired would kill the whole ladder)."""
    try:
        return subprocess.run(args, capture_output=True, text=True, timeout=timeout)
    except subprocess.TimeoutExpired as e:
        class _Fail:
            returncode = -9
            stdout = (e.stdout or b"").decode() if isinstance(e.stdout, bytes) else (e.stdout or "")
            stderr = ((e.stderr or b"").decode() if isinstance(e.stderr, bytes) else (e.stderr or "")) + "\n[attempt timed out]"
        return _Fail()


def _child_result(proc):
    """Parse a BENCH_RESULT json line from a measuring child."""
    for line in (proc.stdout or "").splitlines():
        if line.startswith("BENCH_RESULT "):
            return json.loads(line[len("BENCH_RESULT "):])
    return None


def _log(msg):
    sys.stderr.write("[bench %5.0fs] %s\n" % (time.time() - _T0, msg))
    sys.stderr.flush()


_T0 = time.time()


def main():
    if len(sys.argv) > 1 and sys.argv[1] == "--preflight":
        # trivial device op: proves the TPU tunnel is alive before the
        # ladder commits to hour-scale compile timeouts
        import jax.numpy as jnp

        print("PREFLIGHT_OK %.1f" % float(jnp.ones((8, 128)).sum()), flush=True)
        return
    if len(sys.argv) > 1 and sys.argv[1] == "--gate":
        bf16_parity_gate()
        return
    if len(sys.argv) > 1 and sys.argv[1] == "--gate-full":
        bf16_parity_gate(full_res=True)
        return
    if len(sys.argv) > 1 and sys.argv[1] == "--measure-baseline":
        from benchmarks.baselines_bench import measure_baseline

        print("BENCH_RESULT " + json.dumps(
            measure_baseline(sys.argv[2], int(sys.argv[3]), sys.argv[4])),
            flush=True)
        return
    if len(sys.argv) > 1 and sys.argv[1] == "--measure":
        # child mode: one attempt, print a single JSON stats line
        k = int(sys.argv[2])
        warp_impl = sys.argv[3] if len(sys.argv) > 3 else "packed"
        print("BENCH_RESULT " + json.dumps(measure(k, warp_impl)), flush=True)
        return
    if len(sys.argv) > 1 and sys.argv[1] == "--measure-train":
        remat = len(sys.argv) > 3 and sys.argv[3] == "remat"
        print("BENCH_RESULT " + json.dumps(
            measure_train(int(sys.argv[2]), remat)), flush=True)
        return
    if len(sys.argv) > 1 and sys.argv[1] == "--measure-warps":
        print("BENCH_RESULT " + json.dumps(measure_warps()), flush=True)
        return

    budget = float(os.environ.get("SMILECODE_BENCH_BUDGET_S", "1700"))

    def remaining():
        return budget - (time.time() - _T0)

    # fast liveness gate: a dead/hung TPU tunnel (observed 2026-08-17: even
    # jax.devices() blocked indefinitely) must fail the bench in minutes
    # with an explicit record, not eat hour-scale attempt timeouts
    pre = _run_child(
        [sys.executable, os.path.abspath(__file__), "--preflight"], timeout=300
    )
    if "PREFLIGHT_OK" not in (pre.stdout or ""):
        _log("preflight failed: TPU unreachable; tail:\n%s"
             % "\n".join((pre.stderr or "").splitlines()[-5:]))
        print(json.dumps({
            "metric": "modet_infer_ms_160x192x160",
            "value": None,
            "unit": "ms",
            "vs_baseline": 0.0,
            "error": "tpu-unreachable-preflight",
        }))
        sys.exit(1)
    _log("preflight OK")

    result = {
        "metric": "modet_infer_ms_160x192x160",
        "value": None,
        "unit": "ms",
        "vs_baseline": 0.0,
    }
    printed = False

    def emit():
        nonlocal printed
        if not printed:
            print(json.dumps(result), flush=True)
            printed = True

    # if the driver SIGTERMs the whole bench (rc=124 three rounds running),
    # still print whatever is banked so `parsed` is never null again
    def _on_term(signum, frame):
        _log("SIGTERM received — emitting banked result")
        emit()
        os._exit(0 if result["value"] is not None else 1)

    signal.signal(signal.SIGTERM, _on_term)

    def attempt(args, timeout, label):
        if remaining() < 90:
            _log(f"skipping {label}: budget exhausted ({remaining():.0f}s left)")
            return None
        t = max(120, min(timeout, remaining() - 30))
        _log(f"starting {label} (timeout {t:.0f}s)")
        proc = _run_child([sys.executable, os.path.abspath(__file__), *args], t)
        stats = _child_result(proc)
        if stats is None:
            _log("%s failed (rc=%s); tail:\n%s" % (
                label, getattr(proc, "returncode", "?"),
                "\n".join((proc.stderr or "").splitlines()[-8:])))
        return stats

    # ---- phase 1: bank a cheap f32 number (worth more than any speedup —
    # three rounds of failed artifacts say so)
    attempts = F32_ATTEMPTS
    if os.environ.get("SMILECODE_BENCH_K"):
        attempts = ((int(os.environ["SMILECODE_BENCH_K"]), "packed"),)
    for k, impl in attempts:
        stats = attempt(["--measure", str(k), impl], 3600, f"f32 k={k} {impl}")
        if stats:
            result["value"] = round(stats["per_pair_ms"], 3)
            result["vs_baseline"] = round(BASELINE_MS / stats["per_pair_ms"], 3)
            result["p50_pair_ms"] = round(stats["p50_pair_ms"], 3)
            result["pairs_per_sec_per_chip"] = round(stats["pairs_per_sec_per_chip"], 3)
            result["config"] = f"k={k} {impl}"
            _log(f"BANKED f32 {impl}: {result['value']} ms/pair")
            break

    if result["value"] is None:
        emit()
        sys.exit(1)

    # ---- phase 2: bf16 upgrade — half-res guarded gate child first; only
    # a passing gate buys the full-res bf16 measure, which overwrites the
    # headline only if it actually improves it
    def gate_stats(proc):
        for line in (proc.stdout or "").splitlines():
            if line.startswith("GATE_STATS "):
                return json.loads(line[len("GATE_STATS "):])
        return None

    gate_proc = None
    if remaining() > 400:
        t = max(120, min(1800, remaining() - 120))
        _log(f"starting bf16 gate (half-res, guarded; timeout {t:.0f}s)")
        gate_proc = _run_child(
            [sys.executable, os.path.abspath(__file__), "--gate"], t)
        for line in (gate_proc.stderr or "").splitlines():
            if "parity gate" in line:
                _log(line.strip())
        st = gate_stats(gate_proc)
        if st is not None:
            st["passed"] = "GATE_OK" in (gate_proc.stdout or "")
            result["bf16_gate"] = st
    if gate_proc is not None and "GATE_OK" in (gate_proc.stdout or ""):
        stats = attempt(["--measure", "2", "planes-bf16"], 3600, "bf16 k=2 planes")
        if stats and stats["per_pair_ms"] < result["value"]:
            result["value"] = round(stats["per_pair_ms"], 3)
            result["vs_baseline"] = round(BASELINE_MS / stats["per_pair_ms"], 3)
            result["p50_pair_ms"] = round(stats["p50_pair_ms"], 3)
            result["pairs_per_sec_per_chip"] = round(stats["pairs_per_sec_per_chip"], 3)
            result["config"] = "k=2 planes-bf16"
            _log(f"UPGRADED to bf16: {result['value']} ms/pair")
    elif gate_proc is not None:
        _log("bf16 gate did not pass — keeping f32 number; tail:\n%s"
             % "\n".join((gate_proc.stderr or "").splitlines()[-4:]))

    # ---- phase 3: full-res train-step row (VERDICT r2 weak #4). k=1 ONLY:
    # XLA fully unrolls a 2-trip scan and co-allocates both iterations'
    # backward activations, pushing the full-res train step into HBM paging
    # on this shared tunnel — measured 2026-08-19: 7566 ms/step at k=2
    # (twice) vs 135.6 ms at k=1 (train_bisect, same graph). The carry
    # dependency serializes compute but not buffer lifetimes.
    stats = attempt(["--measure-train", "1"], 3600, "train k=1")
    if stats:
        result["train_step_ms_full_res"] = round(stats["per_step_ms"], 3)

    # ---- phase 4: guarded warp ladder on smooth realistic (+-4 voxel)
    # INJECTED flows, summed over every warp site of the forward — the
    # production warp number that needs no trained checkpoint
    stats = attempt(["--measure-warps"], 3600, "prod warps")
    if stats:
        result["prod_warps_ms"] = round(stats["warps_ms"], 3)

    # ---- phase 5: production-config e2e row (VERDICT r3 weak #4): guarded
    # warps + trained-checkpoint params when benchmarks/prod_ckpt.npz
    # exists (realistic smooth flows), else excited params (softmax
    # tie-breaking noise flows — an oracle-fallback worst-case bound)
    stats = attempt(["--measure", "2", "planes-prod"], 3600, "prod k=2 planes")
    if stats:
        result["prod_guarded_ms"] = round(stats["per_pair_ms"], 3)

    # ---- phase 6: full-res guarded bf16 gate on-chip (VERDICT r4 #6) —
    # the full-res anchor for the bf16 evidence chain; prod_ckpt params
    # when benchmarks/prod_ckpt.npz exists
    if remaining() > 200:
        t = max(120, min(1800, remaining() - 60))
        _log(f"starting bf16 gate (FULL-res, guarded; timeout {t:.0f}s)")
        gf = _run_child(
            [sys.executable, os.path.abspath(__file__), "--gate-full"], t)
        st = gate_stats(gf)
        if st is not None:
            st["passed"] = "GATE_OK" in (gf.stdout or "")
            result["bf16_gate_full"] = st
            _log(f"full-res gate: {st}")
        else:
            _log("full-res gate produced no stats; tail:\n%s"
                 % "\n".join((gf.stderr or "").splitlines()[-4:]))

    # ---- phase 7 (LAST — 6 families x potentially-cold full-res compiles
    # must never starve the cheaper-when-warm production rows above):
    # on-chip smoke + timing for every baseline family (VERDICT r4 #3) —
    # the reference smoke blocks at full res, OOM/compile-laddered down to
    # half res; each family in its own subprocess
    from benchmarks.baselines_bench import FAMILIES

    baselines = {}
    for fam in FAMILIES:
        if remaining() < 200:
            baselines[fam] = {"skipped": "budget"}
            continue
        for k, res in ((2, "full"), (1, "full"), (1, "half")):
            stats = attempt(["--measure-baseline", fam, str(k), res],
                            1500, f"baseline {fam} k={k} {res}")
            if stats:
                baselines[fam] = {
                    "ms": round(stats["per_pair_ms"], 3), "res": res, "k": k}
                break
        else:
            baselines.setdefault(fam, {"failed": "all ladder steps"})
    result["baselines"] = baselines

    emit()


if __name__ == "__main__":
    main()
