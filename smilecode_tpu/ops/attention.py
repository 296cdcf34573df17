"""Motion-decomposition neighborhood attention (ModeT core op).

Computes, for every voxel and head, softmax over the 27 logits
``q · k[neighbor] * scale + rpb[offset]`` (3x3x3 neighborhood, zero-padded
borders) and contracts with the constant offset grid (-1,0,1)^3 to yield a
per-head 3-vector deformation subfield.

Parity targets: `/root/reference/ModeT/models.py:278-334` (pure-torch unfold
version) and the fused CUDA op `/root/reference/ModeT-cu/modet/modet_kernel.cu`
(QK+RPB) + torch softmax/`attn @ v` (`/root/reference/ModeT-cu/models.py:300-316`).

This module holds the pure-jnp reference ("oracle") formulation — 27 shifted
slices of the padded key volume, no unfold materialization (the torch version's
"memory boom"), which XLA fuses well — plus the public dispatch that can route
to the fused Pallas TPU kernel in `smilecode_tpu.kernels.modet_attn`.

Token ordering matches the reference: t = (od*3 + oh)*3 + ow over window
positions, offset[t] = (od-1, oh-1, ow-1).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np


def offset_grid(kernel_size: int = 3) -> np.ndarray:
    """(k^3, 3) constant V matrix of integer offsets, reference ordering."""
    r = np.arange(-(kernel_size // 2), kernel_size // 2 + 1)
    dd, hh, ww = np.meshgrid(r, r, r, indexing="ij")
    return np.stack([dd, hh, ww], axis=-1).reshape(-1, 3).astype(np.float32)


# the reference whitelists these neighborhood sizes in its CUDA headers
# (`/root/reference/ModeT-cu/modet/include/utils.h:11-14`), though its
# launcher only ever accepts 3 (`modet_kernel.cu:104` asserts kernel_size==3)
KERNEL_SIZES = (3, 5, 7, 9, 11, 13)


def neighborhood_attention_3d(
    q: jax.Array,
    k: jax.Array,
    rpb: jax.Array | None,
    scale: float = 1.0,
    impl: str = "auto",
    kernel_size: int = 3,
) -> jax.Array:
    """Fused neighborhood attention -> deformation subfields.

    Args:
      q: (B, D, H, W, heads, head_dim) query (fixed-image projection).
      k: (B, D, H, W, heads, head_dim) key (moving-image projection).
      rpb: (heads, k, k, k) relative position bias, or None.
      scale: query scaling (the reference trains with scale=1,
        `/root/reference/ModeT/train.py:67`).
      impl: "xla" (oracle) or "pallas" (fused TPU kernel).
      kernel_size: neighborhood extent, one of `KERNEL_SIZES` (the reference
        whitelist). The fused Pallas kernel implements 3 — the only size the
        reference's own launcher accepts (`modet_kernel.cu:104`) and the only
        one its shipped models use; other sizes route to the XLA oracle.

    Returns:
      (B, D, H, W, heads*3) subfields, channel order head-major then (d,h,w).
    """
    if kernel_size not in KERNEL_SIZES:
        raise ValueError(
            f"kernel_size {kernel_size} not in whitelist {KERNEL_SIZES} "
            "(matches /root/reference/ModeT-cu/modet/include/utils.h:11-14)"
        )
    if impl == "auto":
        # measured on v5e at full res: pallas 6.9 ms vs xla 26 ms
        impl = "pallas" if (
            jax.default_backend() == "tpu" and kernel_size == 3
        ) else "xla"
    if impl == "pallas":
        if kernel_size != 3:
            raise ValueError("the fused Pallas kernel implements kernel_size=3 "
                             "(like the reference CUDA launcher); use impl='xla'")
        from smilecode_tpu.kernels.modet_attn import modet_attention_pallas

        interpret = jax.default_backend() != "tpu"
        return modet_attention_pallas(q, k, rpb, scale, interpret)
    return _neighborhood_attention_xla(q, k, rpb, scale, kernel_size=kernel_size)


def _neighborhood_attention_xla(q, k, rpb, scale, k_prepadded_d: bool = False,
                                kernel_size: int = 3):
    """``k_prepadded_d``: k already carries its 1-voxel D border (shape
    D+2 along axis 1) — used by the spatial-sharding path, where the border
    comes from a neighbor-shard halo exchange instead of zero padding."""
    b, d, h, w, heads, hd = q.shape
    ks = kernel_size
    pad = ks // 2
    qs = q * jnp.asarray(scale, q.dtype)
    d_pad = (0, 0) if k_prepadded_d else (pad, pad)
    kp = jnp.pad(k, ((0, 0), d_pad, (pad, pad), (pad, pad), (0, 0), (0, 0)))
    logits = []
    for od in range(ks):
        for oh in range(ks):
            for ow in range(ks):
                kslice = jax.lax.slice(
                    kp, (0, od, oh, ow, 0, 0), (b, od + d, oh + h, ow + w, heads, hd)
                )
                logit = jnp.sum(qs * kslice, axis=-1)  # (B, D, H, W, heads)
                if rpb is not None:
                    logit = logit + rpb[:, od, oh, ow].astype(logit.dtype)
                logits.append(logit)
    attn = jnp.stack(logits, axis=-1)  # (B, D, H, W, heads, k^3)
    attn = jax.nn.softmax(attn, axis=-1)
    offs = jnp.asarray(offset_grid(ks), attn.dtype)  # (k^3, 3)
    # HIGHEST precision: the default lets the MXU run this contraction in
    # bf16 (≈2.6e-3 error on TPU); offsets are exact small integers.
    out = jnp.einsum(
        "...t,tc->...c", attn, offs, precision=jax.lax.Precision.HIGHEST
    )  # (B, D, H, W, heads, 3)
    return out.reshape(b, d, h, w, heads * 3)
