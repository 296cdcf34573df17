import os
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/root/.jax_cache")
import numpy as np, jax, jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

X = np.arange(64 * 128, dtype=np.float32).reshape(64, 128)
want = X[17:33] + X[18:34]

# P9: same as P8a but roll a 32-row slice
def k9(x_ref, o_ref):
    def body(t, acc):
        al = (t // 8) * 8
        start = pl.multiple_of(16 + al, 8)
        sub = t - al
        tile = pltpu.roll(x_ref[pl.ds(start, 32), :], -sub, axis=0)[:16]
        return acc + tile
    o_ref[...] = jax.lax.fori_loop(1, 3, body, jnp.zeros((16, 128), jnp.float32))

got = np.asarray(pl.pallas_call(
    k9, out_shape=jax.ShapeDtypeStruct((16, 128), jnp.float32))(jnp.asarray(X)))
print("P9 32-row roll: max err", np.abs(got - want).max(), flush=True)

# P10: 16-row roll (v3 style, HB=8)
want10 = X[17:25] + X[18:26]
def k10(x_ref, o_ref):
    def body(t, acc):
        al = (t // 8) * 8
        start = pl.multiple_of(16 + al, 8)
        sub = t - al
        tile = pltpu.roll(x_ref[pl.ds(start, 16), :], -sub, axis=0)[:8]
        return acc + tile
    o_ref[...] = jax.lax.fori_loop(1, 3, body, jnp.zeros((8, 128), jnp.float32))

got = np.asarray(pl.pallas_call(
    k10, out_shape=jax.ShapeDtypeStruct((8, 128), jnp.float32))(jnp.asarray(X)))
print("P10 16-row roll: max err", np.abs(got - want10).max(), flush=True)
