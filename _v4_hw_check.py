import os
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/root/.jax_cache")
import numpy as np, jax, jax.numpy as jnp
from smilecode_tpu.kernels.warp3d_v4 import warp3d_planes_v4, KD
from smilecode_tpu.models.modet_planes import _warp_planes_ref

rng = np.random.default_rng(0)
B, C, D, H, W = 1, 4, 32, 40, 144
src = jnp.asarray(rng.random((B*C, D, H, W), dtype=np.float64).astype(np.float32))
# smooth flow +-3 voxels
low = rng.standard_normal((3, 6, 6, 6)).astype(np.float32)
fl = jax.image.resize(jnp.asarray(low), (3, D, H, W), "linear")
fl = fl / jnp.abs(fl).max() * 3.0
flow = fl[None]
base_d = jax.lax.broadcasted_iota(jnp.float32, (1, D, H, W), 1)
base_h = jax.lax.broadcasted_iota(jnp.float32, (1, D, H, W), 2)
base_w = jax.lax.broadcasted_iota(jnp.float32, (1, D, H, W), 3)
cd, ch, cw = base_d + flow[:,0], base_h + flow[:,1], base_w + flow[:,2]
out = jax.jit(lambda s, a, b_, c_: warp3d_planes_v4(s, a, b_, c_, C))(src, cd, ch, cw)
ref = _warp_planes_ref(src.reshape(B, C, D, H, W), flow).reshape(B*C, D, H, W)
err = float(jnp.abs(out - ref).max())
print("smooth flow max err:", err)
# near-zero flow
flow0 = flow * 1e-4
cd0, ch0, cw0 = base_d + flow0[:,0], base_h + flow0[:,1], base_w + flow0[:,2]
out0 = jax.jit(lambda s, a, b_, c_: warp3d_planes_v4(s, a, b_, c_, C))(src, cd0, ch0, cw0)
ref0 = _warp_planes_ref(src.reshape(B, C, D, H, W), flow0).reshape(B*C, D, H, W)
print("near-zero flow max err:", float(jnp.abs(out0 - ref0).max()))
# wild flow exercising full window
flw = fl / jnp.abs(fl).max() * 5.5
floww = flw[None]
cdw, chw, cww = base_d + floww[:,0], base_h + floww[:,1], base_w + floww[:,2]
outw = jax.jit(lambda s, a, b_, c_: warp3d_planes_v4(s, a, b_, c_, C))(src, cdw, chw, cww)
refw = _warp_planes_ref(src.reshape(B, C, D, H, W), floww).reshape(B*C, D, H, W)
print("wide flow max err:", float(jnp.abs(outw - refw).max()))
assert err < 2e-5
