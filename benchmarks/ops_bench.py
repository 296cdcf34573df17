"""Per-op benchmarks at the LPBA workload shapes (run on the real chip).

Usage: python benchmarks/ops_bench.py [warp|warpk|attn|conv|encoder|all]
"""

from __future__ import annotations

import sys

import numpy as np

import jax
import jax.numpy as jnp

from benchmarks.timing import bench_op, measure_overhead

RNG = np.random.default_rng(0)
S = (160, 192, 160)


def _vol(c, shape=S, dtype=jnp.float32):
    return jnp.asarray(
        RNG.random((1, *shape, c), dtype=np.float64).astype(np.float32)
    ).astype(dtype)


def _flow(shape=S):
    return jnp.asarray((RNG.random((1, *shape, 3)) * 4 - 2).astype(np.float32))


def _smooth_flow(shape=S, mag=3.0, kpts=6):
    from smilecode_tpu.ops.resize import interp_trilinear

    coarse = RNG.standard_normal((1, kpts, kpts, kpts, 3)).astype(np.float32) * mag
    return jnp.asarray(interp_trilinear(jnp.asarray(coarse), shape))


def bench_warp(oh):
    from smilecode_tpu.ops.warp import warp, _warp_simple

    for dt in (jnp.float32, jnp.bfloat16):
        for c in (1, 3, 8):
            ms = bench_op(
                lambda s, f: warp(s, f), lambda: [_vol(c, dtype=dt), _flow()],
                k=3, overhead_ms=oh,
            )
            print(f"warp packed   C={c} {dt.__name__:9s}: {ms:8.2f} ms")


def bench_warpk(oh):
    """Windowed/guarded kernels on smooth (realistic) flows."""
    from smilecode_tpu.kernels.warp3d import warp3d_guarded, warp3d_pallas
    from smilecode_tpu.ops.warp import warp

    for dt in (jnp.float32, jnp.bfloat16):
        for c in (1, 3, 8):
            mk = lambda c=c, dt=dt: [_vol(c, dtype=dt), _smooth_flow()]
            p = bench_op(lambda s, f: warp(s, f, impl="packed"), mk, k=3, overhead_ms=oh)
            w = bench_op(lambda s, f: warp3d_pallas(s, f, False), mk, k=3, overhead_ms=oh)
            g = bench_op(lambda s, f: warp3d_guarded(s, f, False), mk, k=3, overhead_ms=oh)
            print(f"warp C={c} {dt.__name__:9s}: packed {p:7.2f}  windowed {w:7.2f}  guarded {g:7.2f} ms")


def bench_attn(oh):
    from smilecode_tpu.ops.attention import neighborhood_attention_3d

    for dt in (jnp.float32, jnp.bfloat16):
        for impl in ("xla", "pallas"):
            def f(q, k, impl=impl):
                return neighborhood_attention_3d(q, k, None, 1.0, impl=impl)

            mk = lambda dt=dt: [
                jnp.asarray(RNG.standard_normal((1, *S, 1, 6)).astype(np.float32)).astype(dt),
                jnp.asarray(RNG.standard_normal((1, *S, 1, 6)).astype(np.float32)).astype(dt),
            ]
            ms = bench_op(f, mk, k=3, overhead_ms=oh)
            print(f"attention {impl:6s} {dt.__name__:9s} 1head fullres: {ms:8.2f} ms")


def bench_conv(oh):
    for cin, cout in ((4, 8), (8, 8), (16, 16)):
        kern = jnp.asarray(RNG.standard_normal((3, 3, 3, cin, cout)).astype(np.float32) * 0.1)

        def direct(x, k):
            return jax.lax.conv_general_dilated(
                x, k.astype(x.dtype), (1, 1, 1), [(1, 1)] * 3,
                dimension_numbers=("NDHWC", "DHWIO", "NDHWC"),
            )

        for dt in (jnp.float32, jnp.bfloat16):
            mk = lambda cin=cin, dt=dt: [_vol(cin, dtype=dt), kern]
            ms = bench_op(direct, mk, k=3, overhead_ms=oh)
            print(f"conv3x3 {cin}->{cout} direct {dt.__name__:9s}: {ms:8.2f} ms")


def bench_encoder(oh):
    from smilecode_tpu.models import Encoder
    from smilecode_tpu.ops.encoder_s2d import encoder_s2d_apply

    enc = Encoder()
    params = enc.init(jax.random.PRNGKey(0), _vol(1))

    for dt in (jnp.float32, jnp.bfloat16):
        def f(x):
            return enc.apply(params, x)

        ms = bench_op(f, lambda dt=dt: [_vol(1, dtype=dt)], k=2, overhead_ms=oh)
        print(f"encoder fullres {dt.__name__:9s}: {ms:8.2f} ms")

    for dt in (jnp.float32, jnp.bfloat16):
        def f2(x):
            return encoder_s2d_apply(params["params"], x)

        ms = bench_op(f2, lambda dt=dt: [_vol(1, dtype=dt)], k=2, overhead_ms=oh)
        print(f"encoder s2d-resident {dt.__name__:9s}: {ms:8.2f} ms")


if __name__ == "__main__":
    which = sys.argv[1] if len(sys.argv) > 1 else "all"
    oh = measure_overhead()
    print(f"(host round-trip overhead: {oh:.1f} ms)")
    if which in ("warp", "all"):
        bench_warp(oh)
    if which in ("warpk", "all"):
        bench_warpk(oh)
    if which in ("attn", "all"):
        bench_attn(oh)
    if which in ("conv", "all"):
        bench_conv(oh)
    if which in ("encoder", "all"):
        bench_encoder(oh)
