"""Full training-step benchmark: fwd + loss + bwd + amsgrad update on-chip.

Usage: python benchmarks/train_bench.py [half|full] [packed|pallas|guarded]

half = 80x96x80 (the reference's Half dataset resolution), full = LPBA
160x192x160. Reports ms/step; the attention backward runs the fused Pallas
dq/dk/drpb kernels (kernels/modet_attn.py).
"""

from __future__ import annotations

import os
import sys

os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/root/.jax_cache")

import numpy as np

import jax
import jax.numpy as jnp
import optax

from benchmarks.timing import measure_overhead, bench_op

RNG = np.random.default_rng(0)


def main(size: str = "half", warp_impl: str = "packed"):
    from smilecode_tpu.ops import warp as warp_mod

    if warp_impl != "planes":
        warp_mod.WARP_IMPL = warp_impl

    from smilecode_tpu.models import ModeT
    from smilecode_tpu.losses import ncc_vxm, grad3d

    shape = (80, 96, 80) if size == "half" else (160, 192, 160)
    model = ModeT(qk_scale=1.0)
    mv = jnp.asarray(RNG.random((1, *shape, 1), dtype=np.float64).astype(np.float32))
    fx = jnp.asarray(RNG.random((1, *shape, 1), dtype=np.float64).astype(np.float32))
    params = model.init(jax.random.PRNGKey(0), mv, fx)
    tx = optax.amsgrad(1e-4)
    opt_state = tx.init(params)

    if warp_impl == "planes":
        from smilecode_tpu.models.modet_planes import modet_forward_planes

        def forward(p, m, f):
            return modet_forward_planes(p, m, f, qk_scale=1.0)
    else:
        def forward(p, m, f):
            return model.apply(p, m, f)

    def step(params, opt_state, m, f):
        def loss_fn(p):
            moved, flow = forward(p, m, f)
            return ncc_vxm(moved, f) + grad3d(flow, penalty="l2")

        loss, grads = jax.value_and_grad(loss_fn)(params)
        updates, opt_state = tx.update(grads, opt_state, params)
        params = optax.apply_updates(params, updates)
        return params, opt_state, loss

    oh = measure_overhead()

    def fn(m, f):
        p2, o2, loss = step(params, opt_state, m, f)
        return loss

    def mk():
        return [
            jnp.asarray(RNG.random((1, *shape, 1), dtype=np.float64).astype(np.float32)),
            fx,
        ]

    ms = bench_op(fn, mk, k=2, iters=3, overhead_ms=oh)
    print(f"train step {size} ({shape}) warp={warp_impl}: {ms:8.1f} ms/step "
          f"({1000.0 / ms:.2f} steps/s)")


if __name__ == "__main__":
    size = sys.argv[1] if len(sys.argv) > 1 else "half"
    warp_impl = sys.argv[2] if len(sys.argv) > 2 else "packed"
    main(size, warp_impl)
