"""On-chip cost of the warp adjoint pieces at full res.

Measures, per channel count:
  * d_flow via the fused v3 kernel (`warp3d_planes_v3_dflow`)
  * d_src via the oracle transpose (XLA scatter-add of 8 corners)
  * full oracle VJP (d_src + d_flow together, the round-2 training path)

Decides whether a dedicated d_src Pallas kernel is worth building.
Usage: python -m benchmarks.warp_adjoint_bench [amp]
"""

import os
import sys

os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/root/.jax_cache")

import numpy as np
import jax
import jax.numpy as jnp

from benchmarks.timing import bench_op, measure_overhead
from benchmarks.warp_v3_bench import smooth_flow, SHAPE
from smilecode_tpu.kernels.warp3d_v3 import warp3d_planes_v3_dflow
from smilecode_tpu.models.modet_planes import _warp_planes_ref
from smilecode_tpu.ops.warp import base_grid

RNG = np.random.default_rng(3)


def main():
    amp = float(sys.argv[1]) if len(sys.argv) > 1 else 1.0
    d, h, w = SHAPE
    fl = jnp.asarray(smooth_flow(SHAPE, amp=amp)[None])
    flp = fl.transpose(0, 4, 1, 2, 3)
    coords = base_grid(d, h, w, jnp.float32)[None] + fl
    cd, ch, cw = coords[..., 0], coords[..., 1], coords[..., 2]

    oh = measure_overhead()
    print(f"amp={amp} host overhead {oh:.1f} ms", flush=True)

    for c in (1, 3, 8):
        def mk():
            src = jnp.asarray(
                RNG.standard_normal((1, c, d, h, w)).astype(np.float32)
            )
            g = jnp.asarray(
                RNG.standard_normal((1, c, d, h, w)).astype(np.float32)
            )
            return src, g

        def dflow_kernel(src, g):
            return warp3d_planes_v3_dflow(
                src.reshape(c, d, h, w), cd, ch, cw, g.reshape(c, d, h, w), c
            )

        def dsrc_oracle(src, g):
            _, vjp = jax.vjp(lambda s: _warp_planes_ref(s, flp), src)
            return vjp(g)

        def full_oracle(src, g):
            _, vjp = jax.vjp(_warp_planes_ref, src, flp)
            return vjp(g)

        t_df = bench_op(dflow_kernel, mk, k=2, overhead_ms=oh)
        t_ds = bench_op(dsrc_oracle, mk, k=2, overhead_ms=oh)
        t_fo = bench_op(full_oracle, mk, k=2, overhead_ms=oh)
        print(
            f"C={c}: d_flow(kernel) {t_df:.1f} ms | d_src(oracle) {t_ds:.1f} ms"
            f" | full oracle vjp {t_fo:.1f} ms",
            flush=True,
        )


if __name__ == "__main__":
    main()
