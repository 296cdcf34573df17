import os
import jax
jax.config.update("jax_platforms", "cpu")
import numpy as np, jax.numpy as jnp
import smilecode_tpu.kernels.warp3d_v4 as v4
from smilecode_tpu.models.modet_planes import _warp_planes_ref

rng = np.random.default_rng(0)
B, C, D, H, W = 1, 4, 32, 48, 160
src = jnp.asarray(rng.random((B*C, D, H, W), dtype=np.float64).astype(np.float32))
low = rng.standard_normal((3, 6, 6, 6)).astype(np.float32)
fl = jax.image.resize(jnp.asarray(low), (3, D, H, W), "linear")
for amp, name in ((3.0, "amp3"), (1e-4*3, "near0")):
    f = fl / jnp.abs(fl).max() * amp
    flow = f[None]
    bd = jax.lax.broadcasted_iota(jnp.float32, (1, D, H, W), 1)
    bh = jax.lax.broadcasted_iota(jnp.float32, (1, D, H, W), 2)
    bw = jax.lax.broadcasted_iota(jnp.float32, (1, D, H, W), 3)
    cd, ch, cw = bd + flow[:,0], bh + flow[:,1], bw + flow[:,2]
    out = v4.warp3d_planes_v4(src, cd, ch, cw, C, True)
    ref = _warp_planes_ref(src.reshape(B, C, D, H, W), flow).reshape(B*C, D, H, W)
    e = np.abs(np.asarray(out - ref))
    viol = float(v4.warp_v4_window_violations(cd, D))
    print(name, "max", e.max(), "mean", e.mean(), "viol", viol)
