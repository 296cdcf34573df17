"""Spatial (halo-exchange) parallelism: shard the D axis across devices.

The registration analog of context parallelism (SURVEY.md section 2.5): when a
volume plus activations exceeds one chip's HBM, shard the depth axis over the
("spatial",) mesh axis and exchange 1-voxel (or wider) halos over ICI with
`jax.lax.ppermute` for stencil ops (3^3 convs, the 3x3x3 neighborhood
attention window, box filters).

Building blocks:
  * `halo_exchange(x, halo)` — inside shard_map: pull `halo` slabs from both
    D-neighbors (zeros at the volume boundary, matching the unsharded ops'
    zero padding);
  * `spatial_map(fn, halo, mesh)` — run `fn` (a stencil whose receptive
    field along D is <= halo, VALID along D on the padded block) under
    shard_map with halos. NOTE: for CHAINS of zero-padded stencils, exchange
    per layer (use `halo_conv` inside one spatial_map(halo=0)) — a single
    deep halo would evaluate inner layers at out-of-volume positions where
    the unsharded chain sees the next layer's zero padding instead;
  * `halo_conv(...)` — per-layer halo exchange + conv, the composable unit.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P
from jax import shard_map


def halo_exchange(x: jax.Array, halo: int, axis_name: str = "spatial") -> jax.Array:
    """Pad the local D-block with `halo` slabs from both neighbors.

    x: local block (B, Dl, H, W, C). Returns (B, Dl + 2*halo, H, W, C) with
    zeros beyond the global volume boundary (zero-pad conv semantics).
    """
    if halo == 0:
        return x
    n = jax.lax.axis_size(axis_name)
    idx = jax.lax.axis_index(axis_name)
    perm_fwd = [(i, (i + 1) % n) for i in range(n)]  # send to next
    perm_bwd = [(i, (i - 1) % n) for i in range(n)]  # send to prev
    from_prev = jax.lax.ppermute(x[:, -halo:], axis_name, perm_fwd)
    from_next = jax.lax.ppermute(x[:, :halo], axis_name, perm_bwd)
    zero = jnp.zeros_like(from_prev)
    from_prev = jnp.where(idx == 0, zero, from_prev)
    from_next = jnp.where(idx == n - 1, zero, from_next)
    return jnp.concatenate([from_prev, x, from_next], axis=1)


def spatial_map(fn, halo: int, mesh: Mesh, axis_name: str = "spatial"):
    """Lift a stencil function to a D-sharded computation with halo exchange.

    `fn(block)` receives the halo-padded local block (B, Dl+2h, H, W, C) and
    must return (B, Dl + 2h - 2*halo_consumed..., ...); here we require fn to
    consume exactly the halo (VALID along D), returning (B, Dl, H, W, C').
    """
    spec = P(None, axis_name)

    @functools.partial(
        shard_map, mesh=mesh, in_specs=(spec,), out_specs=spec, check_vma=False
    )
    def run(x):
        return fn(halo_exchange(x, halo, axis_name))

    return run


def shard_spatial(mesh: Mesh, x: jax.Array, axis_name: str = "spatial") -> jax.Array:
    """Place (B, D, H, W, C) with D sharded over the spatial mesh axis."""
    return jax.device_put(x, NamedSharding(mesh, P(None, axis_name)))


def conv3d_valid_d(x, kernel, bias=None, stride=1):
    """3D conv, VALID along D / SAME along H,W — the stencil shape used under
    spatial sharding (the D halo supplies the padding)."""
    k = kernel.shape[0]
    pad = k // 2
    y = jax.lax.conv_general_dilated(
        x,
        kernel.astype(x.dtype),
        window_strides=(stride,) * 3,
        padding=[(0, 0), (pad, pad), (pad, pad)],
        dimension_numbers=("NDHWC", "DHWIO", "NDHWC"),
    )
    if bias is not None:
        y = y + bias.astype(y.dtype)
    return y


def halo_conv(x_local, kernel, bias=None, stride=1, axis_name: str = "spatial"):
    """Per-layer halo exchange + conv: equals an unsharded SAME conv.

    Call inside shard_map (e.g. within `spatial_map(fn, halo=0, ...)`); safe
    to chain with nonlinearities in between, unlike a single deep halo.
    """
    halo = kernel.shape[0] // 2
    block = halo_exchange(x_local, halo, axis_name)
    return conv3d_valid_d(block, kernel, bias, stride)


def make_sharded_conv(mesh: Mesh, kernel, bias=None, axis_name: str = "spatial"):
    """A D-sharded SAME conv equal to the unsharded `ops.blocks.Conv3d`."""
    halo = kernel.shape[0] // 2

    def stencil(block):
        return conv3d_valid_d(block, kernel, bias)

    return spatial_map(stencil, halo, mesh, axis_name)
