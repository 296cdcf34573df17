"""On-chip warp v3 vs v2/packed: exactness + per-op latency at full res.

Usage: python -m benchmarks.warp_v3_bench [amp [freq]]
(defaults amp=3 freq=2; registration flows are typically gentler, amp<=1)
"""

import os
import sys

os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/root/.jax_cache")

import numpy as np
import jax
import jax.numpy as jnp

from benchmarks.timing import bench_op, measure_overhead
from smilecode_tpu.kernels.warp3d import warp3d_planes as v2_planes
from smilecode_tpu.kernels.warp3d_v3 import warp3d_planes_v3, warp_v3_window_violations
from smilecode_tpu.ops.warp import _warp_bilinear_packed, base_grid

SHAPE = (160, 192, 160)
RNG = np.random.default_rng(0)


def smooth_flow(shape, amp=3.0, freq=2):
    g = np.stack(
        np.meshgrid(*[np.linspace(0, freq * np.pi, s) for s in shape], indexing="ij"),
        -1,
    )
    fl = amp * np.stack(
        [
            np.sin(g[..., 0] + i) * np.cos(g[..., 1] - i) * np.sin(g[..., 2] + 2 * i)
            for i in range(3)
        ],
        -1,
    )
    return fl.astype(np.float32)


def main():
    amp = float(sys.argv[1]) if len(sys.argv) > 1 else 3.0
    freq = float(sys.argv[2]) if len(sys.argv) > 2 else 2.0
    d, h, w = SHAPE
    fl = jnp.asarray(smooth_flow(SHAPE, amp=amp, freq=freq)[None])
    coords = base_grid(d, h, w, jnp.float32)[None] + fl
    cd, ch, cw = coords[..., 0], coords[..., 1], coords[..., 2]
    viol = float(warp_v3_window_violations(cd, ch, d, h))
    print(f"flow: smooth amp={amp} freq={freq}, v3 window violations={viol:.4f}",
          flush=True)

    oh = measure_overhead()
    print(f"host overhead {oh:.1f} ms", flush=True)

    for c in (1, 3, 8):
        src = RNG.standard_normal((c, d, h, w)).astype(np.float32)
        srcj = jnp.asarray(src)

        # exactness vs v2 (which matches the oracle on smooth flows)
        out3 = jax.jit(lambda s, a, b, e: warp3d_planes_v3(s, a, b, e, c))(
            srcj, cd, ch, cw
        )
        out2 = jax.jit(lambda s, a, b, e: v2_planes(s, a, b, e, c))(srcj, cd, ch, cw)
        err = float(jnp.abs(out3 - out2).max())
        print(f"C={c}: |v3 - v2|max = {err:.2e}", flush=True)
        assert err < 1e-4, err

        def mk():
            return (
                jnp.asarray(RNG.standard_normal((c, d, h, w)).astype(np.float32)),
                cd, ch, cw,
            )

        t3 = bench_op(lambda s, a, b, e: warp3d_planes_v3(s, a, b, e, c), mk,
                      k=3, overhead_ms=oh)
        t2 = bench_op(lambda s, a, b, e: v2_planes(s, a, b, e, c), mk,
                      k=3, overhead_ms=oh)

        def mk_packed():
            s = jnp.asarray(
                RNG.standard_normal((1, d, h, w, c)).astype(np.float32)
            )
            return (s, fl)

        tp = bench_op(_warp_bilinear_packed, mk_packed, k=3, overhead_ms=oh)
        print(f"C={c}: v3 {t3:.1f} ms | v2 {t2:.1f} ms | packed {tp:.1f} ms",
              flush=True)


if __name__ == "__main__":
    main()
