"""On-chip warp v4 (whole-plane programs, HB=16, SMEM ranges) vs v3.

Usage: python -m benchmarks.warp_v4_bench [amp [freq]]
(registration flows are typically gentle, amp<=1; amp=3 stresses the
candidate loops)
"""

import os
import sys

os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/root/.jax_cache")

import numpy as np
import jax
import jax.numpy as jnp

from benchmarks.timing import bench_op, measure_overhead
from benchmarks.warp_v3_bench import smooth_flow, SHAPE
from smilecode_tpu.kernels.warp3d_v3 import warp3d_planes_v3
from smilecode_tpu.kernels.warp3d_v4 import (
    warp3d_planes_v4,
    warp_v4_window_violations,
)
from smilecode_tpu.ops.warp import base_grid

RNG = np.random.default_rng(0)


def main():
    amp = float(sys.argv[1]) if len(sys.argv) > 1 else 3.0
    freq = float(sys.argv[2]) if len(sys.argv) > 2 else 2.0
    d, h, w = SHAPE
    fl = jnp.asarray(smooth_flow(SHAPE, amp=amp, freq=freq)[None])
    coords = base_grid(d, h, w, jnp.float32)[None] + fl
    cd, ch, cw = coords[..., 0], coords[..., 1], coords[..., 2]
    viol = float(warp_v4_window_violations(cd, d))
    print(f"flow: smooth amp={amp} freq={freq}, v4 window violations={viol:.4f}",
          flush=True)

    oh = measure_overhead()
    print(f"host overhead {oh:.1f} ms", flush=True)

    for c in (1, 4, 8):
        src = RNG.standard_normal((c, d, h, w)).astype(np.float32)
        srcj = jnp.asarray(src)

        out4 = jax.jit(lambda s, a, b, e: warp3d_planes_v4(s, a, b, e, c))(
            srcj, cd, ch, cw
        )
        out3 = jax.jit(lambda s, a, b, e: warp3d_planes_v3(s, a, b, e, c))(
            srcj, cd, ch, cw
        )
        err = float(jnp.abs(out4 - out3).max())
        print(f"C={c}: |v4 - v3|max = {err:.2e}", flush=True)
        if viol == 0.0:
            assert err < 1e-4, err
        elif c == 1:
            # v4 clamps out-of-window d displacements by design; exactness
            # vs v3 only holds when the flow fits the KD-2 d-spread budget
            print(f"  (skipping exactness check: {viol:.2%} window "
                  "violations at this amp — v4 clamps those by design)",
                  flush=True)

        def mk():
            return (
                jnp.asarray(RNG.standard_normal((c, d, h, w)).astype(np.float32)),
                cd, ch, cw,
            )

        t4 = bench_op(lambda s, a, b, e: warp3d_planes_v4(s, a, b, e, c), mk,
                      k=3, overhead_ms=oh)
        t3 = bench_op(lambda s, a, b, e: warp3d_planes_v3(s, a, b, e, c), mk,
                      k=3, overhead_ms=oh)
        print(f"C={c}: v4 {t4:.1f} ms | v3 {t3:.1f} ms", flush=True)


if __name__ == "__main__":
    main()
