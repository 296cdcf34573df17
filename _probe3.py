import os
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/root/.jax_cache")
import numpy as np, jax, jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

X = np.arange(64 * 128, dtype=np.float32).reshape(64, 128)
want = X[17:33] + X[18:34]

def body_roll(t, acc, x_ref):
    al = (t // 8) * 8
    start = pl.multiple_of(16 + al, 8)
    sub = t - al
    tile = pltpu.roll(x_ref[pl.ds(start, 24), :], -sub, axis=0)[:16]
    return acc + tile

# P8a: STATIC python bounds, same body
def k8a(x_ref, o_ref):
    acc = jnp.zeros((16, 128), jnp.float32)
    acc = jax.lax.fori_loop(1, 3, lambda t, a: body_roll(t, a, x_ref), acc)
    o_ref[...] = acc

got = np.asarray(pl.pallas_call(
    k8a, out_shape=jax.ShapeDtypeStruct((16, 128), jnp.float32))(jnp.asarray(X)))
print("P8a static-bounds:   max err", np.abs(got - want).max(), "got00", got[0,0], "want00", want[0,0], flush=True)

# P8b: dynamic SMEM bounds, NO roll (slice only, static start)
def k8b(b_ref, x_ref, o_ref):
    lo, hi = b_ref[0], b_ref[1]
    def body(t, acc):
        return acc + x_ref[pl.ds(16, 16), :] * t.astype(jnp.float32)
    o_ref[...] = jax.lax.fori_loop(lo, hi, body, jnp.zeros((16, 128), jnp.float32))

got = np.asarray(pl.pallas_call(
    k8b,
    in_specs=[pl.BlockSpec(memory_space=pltpu.SMEM), pl.BlockSpec(memory_space=pltpu.VMEM)],
    out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
    out_shape=jax.ShapeDtypeStruct((16, 128), jnp.float32),
)(jnp.asarray([1, 3], jnp.int32), jnp.asarray(X)))
wb = X[16:32] * 3.0
print("P8b dyn-bounds no-roll: max err", np.abs(got - wb).max(), flush=True)

# P8d: dynamic SMEM bounds, 0-based loop + offset inside
def k8d(b_ref, x_ref, o_ref):
    lo, hi = b_ref[0], b_ref[1]
    def body(i, acc):
        return body_roll(lo + i, acc, x_ref)
    o_ref[...] = jax.lax.fori_loop(0, hi - lo, body, jnp.zeros((16, 128), jnp.float32))

got = np.asarray(pl.pallas_call(
    k8d,
    in_specs=[pl.BlockSpec(memory_space=pltpu.SMEM), pl.BlockSpec(memory_space=pltpu.VMEM)],
    out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
    out_shape=jax.ShapeDtypeStruct((16, 128), jnp.float32),
)(jnp.asarray([1, 3], jnp.int32), jnp.asarray(X)))
print("P8d 0-based+offset:  max err", np.abs(got - want).max(), flush=True)

# P8e: dynamic SMEM bounds, roll but STATIC slice start
def k8e(b_ref, x_ref, o_ref):
    lo, hi = b_ref[0], b_ref[1]
    def body(t, acc):
        sub = t - (t // 8) * 8
        tile = pltpu.roll(x_ref[pl.ds(16, 24), :], -sub, axis=0)[:16]
        return acc + tile
    o_ref[...] = jax.lax.fori_loop(lo, hi, body, jnp.zeros((16, 128), jnp.float32))

got = np.asarray(pl.pallas_call(
    k8e,
    in_specs=[pl.BlockSpec(memory_space=pltpu.SMEM), pl.BlockSpec(memory_space=pltpu.VMEM)],
    out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
    out_shape=jax.ShapeDtypeStruct((16, 128), jnp.float32),
)(jnp.asarray([1, 3], jnp.int32), jnp.asarray(X)))
print("P8e dyn-bounds static-start roll: max err", np.abs(got - want).max(), flush=True)
