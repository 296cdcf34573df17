"""Per-op benchmarks at the LPBA workload shapes (run on the real chip).

Usage: python benchmarks/ops_bench.py [warp|attn|conv|encoder|all]
"""

from __future__ import annotations

import sys

import numpy as np

import jax
import jax.numpy as jnp

from benchmarks.timing import bench_op, measure_overhead

RNG = np.random.default_rng(0)
S = (160, 192, 160)


def _vol(c, shape=S):
    return jnp.asarray(RNG.random((1, *shape, c), dtype=np.float64).astype(np.float32))


def _flow(shape=S):
    return jnp.asarray((RNG.random((1, *shape, 3)) * 4 - 2).astype(np.float32))


def bench_warp(oh):
    from smilecode_tpu.ops.warp import warp, _warp_simple

    for c in (1, 3, 8):
        ms = bench_op(lambda s, f: warp(s, f), lambda: [_vol(c), _flow()], k=3, overhead_ms=oh)
        print(f"warp packed   C={c} 160x192x160: {ms:8.2f} ms")
    ms = bench_op(lambda s, f: _warp_simple(s, f), lambda: [_vol(1), _flow()], k=2, overhead_ms=oh)
    print(f"warp simple   C=1 160x192x160: {ms:8.2f} ms")


def bench_attn(oh):
    from smilecode_tpu.ops.attention import neighborhood_attention_3d

    for impl in ("xla", "pallas"):
        def f(q, k, impl=impl):
            return neighborhood_attention_3d(q, k, None, 1.0, impl=impl)

        mk = lambda: [
            jnp.asarray(RNG.standard_normal((1, *S, 1, 6)).astype(np.float32)),
            jnp.asarray(RNG.standard_normal((1, *S, 1, 6)).astype(np.float32)),
        ]
        ms = bench_op(f, mk, k=3, overhead_ms=oh)
        print(f"attention {impl:6s} 1head fullres: {ms:8.2f} ms")


def bench_conv(oh):
    from smilecode_tpu.ops.conv_s2d import conv3d_s2d

    for cin, cout in ((4, 8), (8, 8), (16, 16)):
        kern = jnp.asarray(RNG.standard_normal((3, 3, 3, cin, cout)).astype(np.float32) * 0.1)

        def direct(x, k):
            return jax.lax.conv_general_dilated(
                x, k, (1, 1, 1), [(1, 1)] * 3,
                dimension_numbers=("NDHWC", "DHWIO", "NDHWC"),
            )

        def s2d(x, k):
            return conv3d_s2d(x, k)

        mk = lambda cin=cin: [_vol(cin), kern]
        print(f"conv3x3 {cin}->{cout} direct: {bench_op(direct, mk, k=3, overhead_ms=oh):8.2f} ms   "
              f"s2d: {bench_op(s2d, mk, k=3, overhead_ms=oh):8.2f} ms")


def bench_encoder(oh):
    from smilecode_tpu.models import Encoder
    from smilecode_tpu.ops import blocks

    for impl in ("direct", "s2d"):
        blocks.CONV_IMPL = impl
        enc = Encoder()
        params = enc.init(jax.random.PRNGKey(0), _vol(1))

        def f(x):
            return enc.apply(params, x)

        ms = bench_op(f, lambda: [_vol(1)], k=2, overhead_ms=oh)
        print(f"encoder ({impl:6s}) fullres: {ms:8.2f} ms")
    blocks.CONV_IMPL = "auto"


if __name__ == "__main__":
    which = sys.argv[1] if len(sys.argv) > 1 else "all"
    oh = measure_overhead()
    print(f"(host round-trip overhead: {oh:.1f} ms)")
    if which in ("warp", "all"):
        bench_warp(oh)
    if which in ("attn", "all"):
        bench_attn(oh)
    if which in ("conv", "all"):
        bench_conv(oh)
    if which in ("encoder", "all"):
        bench_encoder(oh)
