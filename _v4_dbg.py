import os
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/root/.jax_cache")
import numpy as np, jax, jax.numpy as jnp
import smilecode_tpu.kernels.warp3d_v4 as v4
from smilecode_tpu.models.modet_planes import _warp_planes_ref

rng = np.random.default_rng(0)
B, C, D, H, W = 1, 4, 32, 48, 160
src = jnp.asarray(rng.random((B*C, D, H, W), dtype=np.float64).astype(np.float32))
low = rng.standard_normal((3, 6, 6, 6)).astype(np.float32)
fl = jax.image.resize(jnp.asarray(low), (3, D, H, W), "linear")
fl = fl / jnp.abs(fl).max() * 3.0
flow = fl[None]
bd = jax.lax.broadcasted_iota(jnp.float32, (1, D, H, W), 1)
bh = jax.lax.broadcasted_iota(jnp.float32, (1, D, H, W), 2)
bw = jax.lax.broadcasted_iota(jnp.float32, (1, D, H, W), 3)
cd, ch, cw = bd + flow[:,0], bh + flow[:,1], bw + flow[:,2]
ref = _warp_planes_ref(src.reshape(B, C, D, H, W), flow).reshape(B*C, D, H, W)

orig_ranges = v4._v4_ranges
def ranges_full(*a, **k):
    out = list(orig_ranges(*a, **k))
    out[1] = jnp.full_like(out[1], 8)  # dneed = kd_n
    return tuple(out)

v4._v4_ranges = ranges_full
out_full = jax.jit(lambda s,a,b_,c_: v4.warp3d_planes_v4(s,a,b_,c_,C))(src, cd, ch, cw)
e = np.abs(np.asarray(out_full - ref))
print("full-dneed: max err", e.max(), "mean", e.mean(), "frac>1e-4", (e>1e-4).mean())
v4._v4_ranges = orig_ranges
out_dyn = jax.jit(lambda s,a,b_,c_,x=0: v4.warp3d_planes_v4(s,a,b_,c_,C))(src, cd, ch, cw)
e2 = np.abs(np.asarray(out_dyn - ref))
print("dyn-dneed:  max err", e2.max(), "mean", e2.mean(), "frac>1e-4", (e2>1e-4).mean())
# locate errors by plane
perr = e2.max(axis=(0,2,3))
print("per-d-plane max err:", np.round(perr, 3).tolist())
