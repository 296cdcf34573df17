import os
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/root/.jax_cache")
import numpy as np, jax, jax.numpy as jnp
import smilecode_tpu.kernels.warp3d_v4 as v4
from smilecode_tpu.models.modet_planes import _warp_planes_ref

def np_warp(src, cd, ch, cw):
    # src (BC, D, H, W); coords (1, D, H, W) absolute; zeros OOB, trilinear
    BC, D, H, W = src.shape
    out = np.zeros_like(src)
    f0d = np.floor(cd[0]).astype(int); f0h = np.floor(ch[0]).astype(int); f0w = np.floor(cw[0]).astype(int)
    td = cd[0] - f0d; th = ch[0] - f0h; tw = cw[0] - f0w
    def at(dz, hz, wz):
        d_, h_, w_ = f0d + dz, f0h + hz, f0w + wz
        ok = (d_ >= 0) & (d_ < D) & (h_ >= 0) & (h_ < H) & (w_ >= 0) & (w_ < W)
        dc, hc, wc = np.clip(d_, 0, D-1), np.clip(h_, 0, H-1), np.clip(w_, 0, W-1)
        v = src[:, dc, hc, wc]  # (BC, D, H, W)
        return v * ok[None]
    for dz in (0,1):
        for hz in (0,1):
            for wz in (0,1):
                wgt = (td if dz else 1-td) * (th if hz else 1-th) * (tw if wz else 1-tw)
                out += at(dz,hz,wz) * wgt[None]
    return out

rng = np.random.default_rng(0)
B, C, D, H, W = 1, 4, 32, 48, 160
src = rng.random((B*C, D, H, W)).astype(np.float32)
low = rng.standard_normal((3, 6, 6, 6)).astype(np.float32)
fl = np.asarray(jax.image.resize(jnp.asarray(low), (3, D, H, W), "linear"))
fl = fl / np.abs(fl).max() * 3.0
gd, gh, gw = np.meshgrid(np.arange(D), np.arange(H), np.arange(W), indexing="ij")
cd = (gd + fl[0])[None].astype(np.float32)
ch = (gh + fl[1])[None].astype(np.float32)
cw = (gw + fl[2])[None].astype(np.float32)
gt = np_warp(src, cd, ch, cw)

js, jcd, jch, jcw = map(jnp.asarray, (src, cd, ch, cw))
out = np.asarray(jax.jit(lambda s,a,b_,c_: v4.warp3d_planes_v4(s,a,b_,c_,C))(js, jcd, jch, jcw))
ref = np.asarray(_warp_planes_ref(js.reshape(B,C,D,H,W), jnp.asarray(fl)[None]).reshape(B*C,D,H,W))
print("kernel vs numpy-gt :", np.abs(out - gt).max())
print("oracle vs numpy-gt :", np.abs(ref - gt).max())
print("kernel vs oracle   :", np.abs(out - ref).max())
