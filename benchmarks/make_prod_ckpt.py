"""Train ModeT briefly on synthetic smooth pairs to mint a production-like
checkpoint for bench.py's guarded prod row.

Why this exists: the prod row needs REALISTIC flows — smooth, +-3..10 voxel
displacement fields like a trained registration network produces. Randomly
excited params cannot provide them: near-init attention logits are ties, so
any perturbation (at ANY scale — measured identical flow stats at 0.01 and
0.1) makes softmax pick random neighbors per token, and the pyramid's
compose-and-upsample amplifies that tie-breaking noise into rough +-11 voxel
fields whose per-plane d-cell spreads (16-19) are adversarial for every
windowed kernel AND unlike anything a trained model emits. A few hundred
NCC+Grad3d steps on smooth blob pairs give genuinely smooth flows of
realistic magnitude — the regime the guard ladder's v4/v4wide branches are
built for (reference training recipe: /root/reference/ModeT/train.py:24-40).

Run on the real TPU chip:  python -m benchmarks.make_prod_ckpt [steps]
Writes benchmarks/prod_ckpt.npz (flattened param paths -> arrays).
"""

import os
import sys
import time

os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/root/.jax_cache")

import numpy as np

import jax
import jax.numpy as jnp
import optax

from smilecode_tpu.models import ModeT
from smilecode_tpu.models.modet_planes import modet_forward_planes
from smilecode_tpu.losses import ncc_vxm, grad3d

SHAPE = (160, 192, 160)
OUT = os.path.join(os.path.dirname(__file__), "prod_ckpt.npz")


def smooth_vol(seed, shape=SHAPE):
    """Brain-ish smooth random volume (same recipe as bench.py)."""
    r = np.random.default_rng(seed)
    low = r.random((20, 24, 20)).astype(np.float32)
    v = jax.image.resize(jnp.asarray(low), shape, "linear")
    v = (v - v.min()) / (v.max() - v.min())
    return v[None, ..., None]


def flatten_params(params):
    out = {}

    def put(path, x):
        out["/".join(str(getattr(k, "key", k)) for k in path)] = np.asarray(x)
        return x

    jax.tree_util.tree_map_with_path(put, params)
    return out


def unflatten_into(params, arrays):
    """Replace each leaf of ``params`` with the same-path array from
    ``arrays`` (shape-checked)."""

    def get(path, x):
        key = "/".join(str(getattr(k, "key", k)) for k in path)
        a = arrays[key]
        assert a.shape == x.shape, f"{key}: {a.shape} != {x.shape}"
        return jnp.asarray(a, x.dtype)

    return jax.tree_util.tree_map_with_path(get, params)


def flow_stats(flow):
    f = np.asarray(flow)  # (1, 3, D, H, W)
    d = f.shape[2]
    celld = np.floor(np.arange(d)[:, None, None] + f[0, 0]).reshape(d, -1)
    spread = celld.max(-1) - celld.min(-1)
    return (f"|flow| max={np.abs(f).max():.2f} p99={np.percentile(np.abs(f), 99):.2f} "
            f"plane d-spread max={spread.max():.0f} p99={np.percentile(spread, 99):.0f}")


def main():
    steps = int(sys.argv[1]) if len(sys.argv) > 1 else 300
    model = ModeT(qk_scale=1.0)
    pairs = [(smooth_vol(100 + 2 * i), smooth_vol(101 + 2 * i)) for i in range(8)]
    params = model.init(jax.random.PRNGKey(0), *pairs[0])
    tx = optax.amsgrad(1e-4)
    opt_state = tx.init(params)

    def loss_fn(p, m, f):
        moved, flow = modet_forward_planes(p, m, f, qk_scale=1.0, guarded_warp=False)
        return ncc_vxm(moved, f) + grad3d(flow, penalty="l2"), flow

    @jax.jit
    def step(params, opt_state, m, f):
        (loss, flow), grads = jax.value_and_grad(loss_fn, has_aux=True)(params, m, f)
        updates, opt_state = tx.update(grads, opt_state, params)
        return optax.apply_updates(params, updates), opt_state, loss, flow

    t0 = time.time()
    for i in range(steps):
        m, f = pairs[i % len(pairs)]
        params, opt_state, loss, flow = step(params, opt_state, m, f)
        if i % 25 == 0 or i == steps - 1:
            print(f"[{time.time()-t0:6.0f}s] step {i}: loss={float(loss):.4f} "
                  f"{flow_stats(flow)}", flush=True)

    np.savez_compressed(OUT, **flatten_params(params))
    print(f"saved {OUT} ({os.path.getsize(OUT)/1e6:.1f} MB)", flush=True)


if __name__ == "__main__":
    main()
