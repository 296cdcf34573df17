"""Honest timing helpers for this TPU environment.

Pitfalls defeated here (discovered in round 1):
  * dispatch is async AND `block_until_ready` can return before execution on
    the tunneled runtime -> every measurement materializes a scalar on host;
  * identical (program, inputs) executions are served from a cache -> every
    iteration uses distinct inputs;
  * the host<->device round trip costs ~29 ms -> ops are repeated K times
    inside one jit (chained through a scalar to stop XLA interleaving them)
    and the separately measured round-trip overhead is subtracted.
"""

from __future__ import annotations

import time

import numpy as np

import jax
import jax.numpy as jnp


def measure_overhead(iters: int = 5) -> float:
    x = jnp.ones((8, 128), jnp.float32)
    f = jax.jit(lambda v: v * 1.0000001)
    float(jnp.sum(f(x)))
    ts = []
    for _ in range(iters):
        t0 = time.perf_counter()
        float(jnp.sum(f(x)))
        ts.append((time.perf_counter() - t0) * 1000)
    return float(np.median(ts))


def bench_op(fn, make_inputs, k: int = 4, iters: int = 3, overhead_ms: float | None = None):
    """Median per-op ms for `fn(*inputs)`; `make_inputs()` must return fresh
    device arrays; fn is repeated k times per timed call, serialized via an
    accumulator dependency on the first input."""
    if overhead_ms is None:
        overhead_ms = measure_overhead()

    @jax.jit
    def rep(*args_flat):
        per_call = len(args_flat) // k
        acc = jnp.zeros((), jnp.float32)
        for i in range(k):
            args = list(args_flat[i * per_call : (i + 1) * per_call])
            # serialize iterations without touching the data: an
            # optimization_barrier ties args[0] to acc (an `+ acc*0` add
            # forced a copy of the input in whatever layout XLA picked —
            # 16x padded for C=8 NDHWC, 2.2 GB of pure benchmarking
            # artifact in one on-chip OOM dump)
            args[0], _ = jax.lax.optimization_barrier((args[0], acc))
            out = fn(*args)
            leaves = jax.tree.leaves(out)
            acc = acc + sum(jnp.sum(l) for l in leaves)
        return acc

    def run_once():
        flat = []
        for _ in range(k):
            flat.extend(make_inputs())
        for a in flat:
            a.block_until_ready()
        t0 = time.perf_counter()
        float(rep(*flat))
        return (time.perf_counter() - t0) * 1000

    run_once()  # compile
    ts = [run_once() for _ in range(iters)]
    return max(0.0, (float(np.median(ts)) - overhead_ms) / k)


def bench_op_scan(fn, make_inputs, k: int = 16, iters: int = 3,
                  overhead_ms: float | None = None):
    """Like `bench_op` but repeats via `lax.scan` over k STACKED distinct
    inputs — compile time is constant in k, so k can be large enough
    (>=16) that the ~29 ms host round trip stops dominating sub-2 ms ops.
    Sequencing between iterations comes from the scan carry (the summed
    output feeds an optimization_barrier with the next inputs)."""
    if overhead_ms is None:
        overhead_ms = measure_overhead()

    sets = [make_inputs() for _ in range(k)]
    stacked = [jnp.stack([s[i] for s in sets]) for i in range(len(sets[0]))]

    @jax.jit
    def rep(*stk):
        def body(acc, args):
            args = list(args)
            args[0], _ = jax.lax.optimization_barrier((args[0], acc))
            out = fn(*args)
            leaves = jax.tree.leaves(out)
            return acc + sum(jnp.sum(l, dtype=jnp.float32) for l in leaves), None

        acc, _ = jax.lax.scan(body, jnp.zeros((), jnp.float32), tuple(stk))
        return acc

    def run_once():
        for a in stacked:
            a.block_until_ready()
        t0 = time.perf_counter()
        float(rep(*stacked))
        return (time.perf_counter() - t0) * 1000

    run_once()  # compile
    ts = [run_once() for _ in range(iters)]
    return max(0.0, (float(np.median(ts)) - overhead_ms) / k)
