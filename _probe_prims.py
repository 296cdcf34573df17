"""Tiny hardware probes: which Pallas primitive is broken on this tunnel?"""
import os
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/root/.jax_cache")
import functools
import numpy as np, jax, jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

X = np.arange(32 * 128, dtype=np.float32).reshape(32, 128)

# probe 1: dynamic sublane roll by SMEM scalar
def k1(amt_ref, x_ref, o_ref):
    a = amt_ref[0]
    o_ref[...] = pltpu.roll(x_ref[...], -a, axis=0)

def run1(amt):
    return pl.pallas_call(
        k1,
        in_specs=[pl.BlockSpec(memory_space=pltpu.SMEM),
                  pl.BlockSpec(memory_space=pltpu.VMEM)],
        out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((32, 128), jnp.float32),
    )(jnp.asarray([amt], jnp.int32), jnp.asarray(X))

for a in (0, 3, 5):
    got = np.asarray(run1(a))
    want = np.roll(X, -a, axis=0)
    print(f"dyn-sublane-roll amt={a}: max err {np.abs(got - want).max()}", flush=True)

# probe 1b: dynamic LANE roll
def k1b(amt_ref, x_ref, o_ref):
    a = amt_ref[0]
    o_ref[...] = pltpu.roll(x_ref[...], -a, axis=1)

def run1b(amt):
    return pl.pallas_call(
        k1b,
        in_specs=[pl.BlockSpec(memory_space=pltpu.SMEM),
                  pl.BlockSpec(memory_space=pltpu.VMEM)],
        out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((32, 128), jnp.float32),
    )(jnp.asarray([amt], jnp.int32), jnp.asarray(X))

for a in (0, 7):
    got = np.asarray(run1b(a))
    want = np.roll(X, -a, axis=1)
    print(f"dyn-lane-roll amt={a}: max err {np.abs(got - want).max()}", flush=True)

# probe 2: STATIC roll
def k2(x_ref, o_ref):
    o_ref[...] = pltpu.roll(x_ref[...], -3, axis=0)

got = np.asarray(pl.pallas_call(
    k2, out_shape=jax.ShapeDtypeStruct((32, 128), jnp.float32))(jnp.asarray(X)))
print("static-sublane-roll: max err", np.abs(got - np.roll(X, -3, axis=0)).max(), flush=True)

# probe 3: dynamic fori bounds from SMEM + dynamic ds slice
def k3(b_ref, x_ref, o_ref):
    lo, hi = b_ref[0], b_ref[1]
    def body(i, acc):
        return acc + x_ref[pl.ds(pl.multiple_of((i // 8) * 8, 8), 8), :][i % 8]
    acc = jax.lax.fori_loop(lo, hi, body, jnp.zeros((128,), jnp.float32))
    o_ref[...] = acc[None] + jnp.zeros((8, 128), jnp.float32)

got = np.asarray(pl.pallas_call(
    k3,
    in_specs=[pl.BlockSpec(memory_space=pltpu.SMEM),
              pl.BlockSpec(memory_space=pltpu.VMEM)],
    out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
    out_shape=jax.ShapeDtypeStruct((8, 128), jnp.float32),
)(jnp.asarray([2, 7], jnp.int32), jnp.asarray(X)))
want = X[2:7].sum(axis=0)
print("dyn-fori+ds: max err", np.abs(got[0] - want).max(), flush=True)
