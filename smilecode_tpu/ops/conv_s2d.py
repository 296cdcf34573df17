"""Space-to-depth 3x3x3 convolution for tiny channel counts.

STATUS: FROZEN (documented negative result; see blocks.py for the policy).
Kept unit-tested behind ``ops.blocks.conv3x3(impl="s2d")`` (lazy import);
the live encoder uses `ops/encoder_s2d.py` instead.

v5e conv lowering pads tiny channel dims catastrophically (observed 16x
HBM expansion for C=8 encoder convs). A stride-1 SAME 3^3 conv on
(B, D, H, W, C) is EXACTLY equivalent to a VALID 2^3 conv on the
space-to-depth representation (B, (D+2)/2, (H+2)/2, (W+2)/2, 8C) with a
rearranged kernel: output voxel p = 2b + q gathers input xpad[2b + q + t],
and u = q + t in [0,4) splits into block offset s = u//2 and parity v:
K2[s, (v, cin), (q, cout)] = K[2s + v - q] (zero outside [0,3)).

8x the lane utilization for 64/27 = 2.4x the MACs — a large net win for
C <= 16, and layouts stop exploding.

STATUS: superseded on the live inference path by `ops/encoder_s2d.py`,
which keeps the whole encoder RESIDENT in s2d space (one s2d in, one
inverse out) instead of round-tripping per conv as this module does. The
per-conv round trip measured NET-NEGATIVE on chip (the s2d/un-s2d
transposes cost more than the padding they save); kept as documentation of
that result and as the unit-tested reference for the s2d kernel algebra
that encoder_s2d builds on.
"""

from __future__ import annotations

import numpy as np

import jax
import jax.numpy as jnp


import functools


@functools.lru_cache(maxsize=None)
def _s2d_map() -> np.ndarray:
    """Constant one-hot map M[s, v, q, t] with s,v,q in [0,8) and t in [0,27)."""
    m = np.zeros((2, 2, 2, 8, 8, 27), np.float32)
    for sd in range(2):
        for sh in range(2):
            for sw in range(2):
                for v in range(8):
                    vd, vh, vw = v >> 2, (v >> 1) & 1, v & 1
                    for q in range(8):
                        qd, qh, qw = q >> 2, (q >> 1) & 1, q & 1
                        td, th, tw = 2 * sd + vd - qd, 2 * sh + vh - qh, 2 * sw + vw - qw
                        if 0 <= td < 3 and 0 <= th < 3 and 0 <= tw < 3:
                            m[sd, sh, sw, v, q, (td * 3 + th) * 3 + tw] = 1.0
    return m


def s2d_kernel(kernel: jax.Array) -> jax.Array:
    """(3,3,3,Cin,Cout) -> (2,2,2, 8*Cin, 8*Cout) rearranged kernel."""
    k, _, _, cin, cout = kernel.shape
    assert k == 3
    m = jnp.asarray(_s2d_map(), kernel.dtype)
    kflat = kernel.reshape(27, cin, cout)
    out = jnp.einsum("xyzvqt,tio->xyzviqo", m, kflat,
                     precision=jax.lax.Precision.HIGHEST)
    return out.reshape(2, 2, 2, 8 * cin, 8 * cout)


def conv3d_s2d(x: jax.Array, kernel: jax.Array, bias=None) -> jax.Array:
    """SAME 3^3 stride-1 conv via space-to-depth; requires even D, H, W."""
    b, d, h, w, c = x.shape
    assert d % 2 == 0 and h % 2 == 0 and w % 2 == 0, (d, h, w)
    xp = jnp.pad(x, ((0, 0), (1, 1), (1, 1), (1, 1), (0, 0)))
    xs = xp.reshape(b, (d + 2) // 2, 2, (h + 2) // 2, 2, (w + 2) // 2, 2, c)
    xs = xs.transpose(0, 1, 3, 5, 2, 4, 6, 7).reshape(
        b, (d + 2) // 2, (h + 2) // 2, (w + 2) // 2, 8 * c
    )
    k2 = s2d_kernel(kernel)
    y = jax.lax.conv_general_dilated(
        xs,
        k2.astype(x.dtype),
        window_strides=(1, 1, 1),
        padding="VALID",
        dimension_numbers=("NDHWC", "DHWIO", "NDHWC"),
    )  # (B, D/2, H/2, W/2, 8*Cout)
    cout = kernel.shape[-1]
    y = y.reshape(b, d // 2, h // 2, w // 2, 2, 2, 2, cout)
    y = y.transpose(0, 1, 4, 2, 5, 3, 6, 7).reshape(b, d, h, w, cout)
    if bias is not None:
        y = y + bias.astype(y.dtype)
    return y
