import os
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/root/.jax_cache")
import numpy as np, jax, jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

X = np.arange(64 * 128, dtype=np.float32).reshape(64, 128)

# P4: fori over blocks, dynamic ds READ + WRITE at r0 = blk*16
def k4(x_ref, o_ref):
    def body(blk, carry):
        r0 = blk * 16
        o_ref[pl.ds(r0, 16), :] = x_ref[pl.ds(r0, 16), :] + 1.0
        return carry
    jax.lax.fori_loop(0, 4, body, 0)

got = np.asarray(pl.pallas_call(
    k4, out_shape=jax.ShapeDtypeStruct((64, 128), jnp.float32))(jnp.asarray(X)))
print("P4 dyn ds r/w in fori: max err", np.abs(got - (X + 1)).max(), flush=True)

# P5: same but with multiple_of hint like v4 uses
def k5(x_ref, o_ref):
    def body(blk, carry):
        r0 = pl.multiple_of(blk * 16, 8)
        o_ref[pl.ds(r0, 16), :] = x_ref[pl.ds(r0, 16), :] * 2.0
        return carry
    jax.lax.fori_loop(0, 4, body, 0)

got = np.asarray(pl.pallas_call(
    k5, out_shape=jax.ShapeDtypeStruct((64, 128), jnp.float32))(jnp.asarray(X)))
print("P5 dyn ds + multiple_of: max err", np.abs(got - X * 2).max(), flush=True)

# P6: floor division of negative traced ints (SMEM scalars)
def k6(t_ref, o_ref):
    t = t_ref[0]
    o_ref[0] = (t // 8) * 8
    o_ref[1] = t % 8

got = np.asarray(pl.pallas_call(
    k6,
    in_specs=[pl.BlockSpec(memory_space=pltpu.SMEM)],
    out_specs=pl.BlockSpec(memory_space=pltpu.SMEM),
    out_shape=jax.ShapeDtypeStruct((2,), jnp.int32),
)(jnp.asarray([-3], jnp.int32)))
print(f"P6 neg floor-div: (-3//8)*8 = {got[0]} (want -8), -3%8 = {got[1]} (want 5)", flush=True)

# P7: nested dynamic fori bounds from SMEM, accumulating rolls of a dyn slice
def k7(b_ref, x_ref, o_ref):
    lo, hi = b_ref[0], b_ref[1]
    def body(t, acc):
        al = (t // 8) * 8
        start = pl.multiple_of(16 + al, 8)
        sub = t - al
        tile = pltpu.roll(x_ref[pl.ds(start, 24), :], -sub, axis=0)[:16]
        return acc + tile
    acc = jax.lax.fori_loop(lo, hi, body, jnp.zeros((16, 128), jnp.float32))
    o_ref[...] = acc

got = np.asarray(pl.pallas_call(
    k7,
    in_specs=[pl.BlockSpec(memory_space=pltpu.SMEM),
              pl.BlockSpec(memory_space=pltpu.VMEM)],
    out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
    out_shape=jax.ShapeDtypeStruct((16, 128), jnp.float32),
)(jnp.asarray([1, 3], jnp.int32), jnp.asarray(X)))
want = X[17:33] + X[18:34]
print("P7 dyn-bounds roll-slice: max err", np.abs(got - want).max(), flush=True)
