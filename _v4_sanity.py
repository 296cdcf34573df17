import os
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/root/.jax_cache")
import numpy as np, jax, jax.numpy as jnp
import smilecode_tpu.kernels.warp3d_v4 as v4
from smilecode_tpu.models.modet_planes import _warp_planes_ref

rng = np.random.default_rng(1)
B, C, D, H, W = 1, 2, 80, 96, 80
src = jnp.asarray(rng.random((B*C, D, H, W)).astype(np.float32))
low = rng.standard_normal((3, 6, 6, 6)).astype(np.float32)
fl = jax.image.resize(jnp.asarray(low), (3, D, H, W), "linear")
fl = fl / jnp.abs(fl).max()
fwd = jax.jit(lambda s,a,b_,c_: v4.warp3d_planes_v4(s,a,b_,c_,C))
bd = jax.lax.broadcasted_iota(jnp.float32, (1, D, H, W), 1)
bh = jax.lax.broadcasted_iota(jnp.float32, (1, D, H, W), 2)
bw = jax.lax.broadcasted_iota(jnp.float32, (1, D, H, W), 3)
for amp, name in ((1e-4, "near0"), (3.0, "amp3")):
    flow = (fl * amp)[None]
    cd, ch, cw = bd + flow[:,0], bh + flow[:,1], bw + flow[:,2]
    out = fwd(src, cd, ch, cw)
    ref = _warp_planes_ref(src.reshape(B,C,D,H,W), flow).reshape(B*C,D,H,W)
    e = np.abs(np.asarray(out - ref))
    viol = float(v4.warp_v4_window_violations(cd, D))
    print(f"{name}: max {e.max():.3e} mean {e.mean():.3e} viol {viol}", flush=True)
