"""Per-op bench: the s2d encoder's 3^3 convs are the #1 block of the bf16
planes forward (30 ms of 107; round-5 trace) yet run at ~5% of MXU peak
(conv0_2: 136 GFLOP bf16 in 7.4 ms). This bench races formulations of the
same SAME-3^3 conv to find the fast one:

  xla      : lax.conv_general_dilated NDHWC (current encoder_s2d path)
  xla_b2   : same, batch=2 (moving+fixed encoder calls batched)
  taps27   : 27 shifted-slice einsums accumulated, NDHWC (C-minor dots)
  taps27_p : same in planes (B,C,D,H,W) layout (what conv3_planes does)

Usage: python -m benchmarks.conv_bench [bf16|f32]
"""
import os
import sys

os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/root/.jax_cache")

import numpy as np
import jax
import jax.numpy as jnp

from benchmarks.timing import bench_op_scan as bench_op, measure_overhead

# (label, (D,H,W), Cin, Cout) — the three dominant encoder conv shapes
SHAPES = [
    ("L0a 80x96x80 32->64", (80, 96, 80), 32, 64),
    ("L0b 80x96x80 64->64", (80, 96, 80), 64, 64),
    ("L1  40x48x40 128->128", (40, 48, 40), 128, 128),
]


def conv_xla(x, k):
    return jax.lax.conv_general_dilated(
        x, k, (1, 1, 1), [(1, 1)] * 3,
        dimension_numbers=("NDHWC", "DHWIO", "NDHWC"))


def conv_taps27(x, k):
    b, d, h, w, c = x.shape
    xp = jnp.pad(x, ((0, 0), (1, 1), (1, 1), (1, 1), (0, 0)))
    out = None
    for od in range(3):
        for oh in range(3):
            for ow in range(3):
                sl = jax.lax.slice(
                    xp, (0, od, oh, ow, 0), (b, od + d, oh + h, ow + w, c))
                t = jnp.einsum("bdhwc,co->bdhwo", sl, k[od, oh, ow])
                out = t if out is None else out + t
    return out


def conv_taps27_planes(x, k):
    b, c, d, h, w = x.shape
    xp = jnp.pad(x, ((0, 0), (0, 0), (1, 1), (1, 1), (1, 1)))
    out = None
    for od in range(3):
        for oh in range(3):
            for ow in range(3):
                sl = jax.lax.slice(
                    xp, (0, 0, od, oh, ow), (b, c, od + d, oh + h, ow + w))
                t = jnp.einsum("co,bcdhw->bodhw", k[od, oh, ow], sl)
                out = t if out is None else out + t
    return out


def conv_dtap3(x, k):
    """3 D-taps, each a (1,3,3)-window conv — gives XLA a 2D-shaped conv."""
    b, d, h, w, c = x.shape
    xp = jnp.pad(x, ((0, 0), (1, 1), (0, 0), (0, 0), (0, 0)))
    out = None
    for od in range(3):
        sl = jax.lax.slice(xp, (0, od, 0, 0, 0), (b, od + d, h, w, c))
        t = jax.lax.conv_general_dilated(
            sl, k[od:od + 1], (1, 1, 1), [(0, 0), (1, 1), (1, 1)],
            dimension_numbers=("NDHWC", "DHWIO", "NDHWC"))
        out = t if out is None else out + t
    return out


def conv_wunf(x, k):
    """W-taps unfolded into channels (K=3Cin), then a (3,3,1)-window conv."""
    b, d, h, w, c = x.shape
    xp = jnp.pad(x, ((0, 0), (0, 0), (0, 0), (1, 1), (0, 0)))
    xw = jnp.concatenate(
        [jax.lax.slice(xp, (0, 0, 0, ow, 0), (b, d, h, ow + w, c))
         for ow in range(3)], axis=-1)
    # kernel (3,3,3,ci,co) -> (3,3,1, 3*ci, co): tap ow folded into Cin
    kw = jnp.concatenate([k[:, :, ow] for ow in range(3)], axis=2)  # (3,3,3ci,co)
    kw = kw[:, :, None]  # (3,3,1,3ci,co)
    return jax.lax.conv_general_dilated(
        xw, kw, (1, 1, 1), [(1, 1), (1, 1), (0, 0)],
        dimension_numbers=("NDHWC", "DHWIO", "NDHWC"))


def conv_f32acc(x, k):
    y = jax.lax.conv_general_dilated(
        x, k, (1, 1, 1), [(1, 1)] * 3,
        dimension_numbers=("NDHWC", "DHWIO", "NDHWC"),
        preferred_element_type=jnp.float32)
    return y.astype(x.dtype)


def chain_ctx(x, k1, k2):
    """Model-context chain: (conv+IN+leaky)x2 — measures the fusion
    environment the encoder convs actually run in."""
    def block(v, kk):
        y = conv_xla(v, kk)
        mean = jnp.mean(y, axis=(1, 2, 3), keepdims=True)
        var = jnp.var(y, axis=(1, 2, 3), keepdims=True)
        y = (y - mean) * jax.lax.rsqrt(var + 1e-5)
        return jnp.where(y >= 0, y, 0.1 * y)
    return block(block(x, k1), k2)


def chain_f32acc(x, k1, k2):
    """Same chain with f32-accumulate convs: IN stats ride the f32 conv
    output, cast back to the io dtype only at the block boundary."""
    def block(v, kk):
        y = jax.lax.conv_general_dilated(
            v, kk, (1, 1, 1), [(1, 1)] * 3,
            dimension_numbers=("NDHWC", "DHWIO", "NDHWC"),
            preferred_element_type=jnp.float32)
        mean = jnp.mean(y, axis=(1, 2, 3), keepdims=True)
        var = jnp.var(y, axis=(1, 2, 3), keepdims=True)
        y = (y - mean) * jax.lax.rsqrt(var + 1e-5)
        return jnp.where(y >= 0, y, 0.1 * y).astype(v.dtype)
    return block(block(x, k1), k2)


def main():
    dt = jnp.bfloat16 if (len(sys.argv) < 2 or sys.argv[1] == "bf16") else jnp.float32
    rng = np.random.default_rng(0)
    oh = measure_overhead()
    print(f"dtype={dt.__name__} host overhead {oh:.1f} ms")
    for label, (d, h, w), cin, cout in SHAPES:
        kern = jnp.asarray(rng.standard_normal((3, 3, 3, cin, cout)), dt)

        def mk(b=1):
            return lambda: [
                jnp.asarray(rng.standard_normal((b, d, h, w, cin)), dt), kern]

        def mk_planes():
            return lambda: [
                jnp.asarray(rng.standard_normal((1, cin, d, h, w)), dt), kern]

        gflop = d * h * w * 27 * cin * cout * 2 / 1e9
        kk = 16 if d >= 80 else 48  # scan reps: sub-2ms ops need lots of signal
        r = {}
        r["xla"] = bench_op(conv_xla, mk(1), k=kk, overhead_ms=oh)
        r["xla_b2"] = bench_op(conv_xla, mk(2), k=kk, overhead_ms=oh) / 2
        r["dtap3"] = bench_op(conv_dtap3, mk(1), k=kk, overhead_ms=oh)
        r["wunf"] = bench_op(conv_wunf, mk(1), k=kk, overhead_ms=oh)
        r["f32acc"] = bench_op(conv_f32acc, mk(1), k=kk, overhead_ms=oh)

        def mk_chain():
            k2 = jnp.asarray(rng.standard_normal((3, 3, 3, cout, cout)), dt)
            return lambda: [
                jnp.asarray(rng.standard_normal((1, d, h, w, cin)), dt),
                kern, k2]

        r["chain/2"] = bench_op(chain_ctx, mk_chain(), k=kk, overhead_ms=oh) / 2
        r["chf32/2"] = bench_op(chain_f32acc, mk_chain(), k=kk, overhead_ms=oh) / 2
        print(f"{label} ({gflop:.0f} GFLOP):  " + "  ".join(
            f"{n}={v:.2f}ms({gflop / max(v, 1e-3):.0f}GF/s)" for n, v in r.items()))
    print("done")


if __name__ == "__main__":
    main()
