"""Vector field integration via scaling and squaring.

Matches `VecInt` in the reference (`/root/reference/ModeT/models.py:70-87`):
``vec *= 1/2**nsteps`` then ``nsteps`` times ``vec = vec + warp(vec, vec)``.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from smilecode_tpu.ops.warp import warp


def vecint(vec: jax.Array, nsteps: int = 7) -> jax.Array:
    """Integrate a stationary velocity field (B, D, H, W, 3) into a flow."""
    if nsteps < 0:
        raise ValueError(f"nsteps should be >= 0, found: {nsteps}")
    vec = vec * (1.0 / (2 ** nsteps))

    def body(_, v):
        return v + warp(v, v)

    return jax.lax.fori_loop(0, nsteps, body, vec)
