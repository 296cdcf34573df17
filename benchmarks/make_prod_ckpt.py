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

Run on the real TPU chip:  python -m benchmarks.make_prod_ckpt [steps] [res]
``res``: full | half | quarter (default quarter — the tie-breaking noise
plateau right after init takes hundreds-to-thousands of steps to escape,
which is only affordable at low res; ModeT params are resolution-independent
so a low-res-trained checkpoint drives full-res prod benches).
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


RES = {
    "full": (160, 192, 160),
    "half": (80, 96, 80),
    "quarter": (40, 48, 40),
}


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


def smooth_true_flow(seed, shape=SHAPE, amp=4.0):
    """Smooth random displacement field, |flow| <= amp voxels."""
    r = np.random.default_rng(seed)
    low = r.standard_normal((3, 10, 12, 10)).astype(np.float32)
    f = jax.image.resize(jnp.asarray(low), (3, *shape), "linear")
    f = f / (jnp.abs(f).max() + 1e-9) * amp
    return jnp.moveaxis(f, 0, -1)[None]  # (1, D, H, W, 3)


def make_pair(seed, shape=SHAPE, amp=4.0):
    """(moving, fixed) with TRUE correspondence AND a shared anatomy.

    Two lessons from failed attempts: (a) independent random pairs have no
    correspondence, so NCC training diverges (flows blew past +-20 within
    25 steps); (b) even warped-copy pairs diverge when the texture is
    self-similar blobs — far-away lookalikes score as well as the true
    match, so large flows are a real NCC minimum. Like brains (skull,
    ventricles anchor real registration), the pair needs one strong SHARED
    anatomy with small per-image variation; then the true smooth +-amp flow
    is the global optimum."""
    from smilecode_tpu.ops.warp import warp

    base = smooth_vol(seed, shape)
    fixed = base + 0.15 * smooth_vol(seed + 500, shape)
    moving_pre = base + 0.15 * smooth_vol(seed + 501, shape)
    moving = warp(moving_pre, smooth_true_flow(seed + 7000, shape, amp=amp))
    return moving, fixed


def main():
    steps = int(sys.argv[1]) if len(sys.argv) > 1 else 2000
    shape = RES[sys.argv[2] if len(sys.argv) > 2 else "quarter"]
    model = ModeT(qk_scale=1.0)
    amp = 4.0 * shape[0] / 160.0  # same physical fraction at every res
    pairs = [make_pair(100 + i, shape, amp) for i in range(8)]
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
    every = max(10, steps // 40)
    # runaway protection only (diverged flows make the data-range-sized
    # kernel loops crawl — 14.7 s/step at full res): the post-init
    # tie-breaking noise plateau peaks near +-19 at half res and must be
    # trained THROUGH, so the brake sits far above it
    brake = 20.0 + 6.0 * amp
    for i in range(steps):
        m, f = pairs[i % len(pairs)]
        params, opt_state, loss, flow = step(params, opt_state, m, f)
        if i % every == 0 or i == steps - 1:
            fstats = flow_stats(flow)
            print(f"[{time.time()-t0:6.0f}s] step {i}: loss={float(loss):.4f} "
                  f"{fstats}", flush=True)
            # diverged flows also make the data-range-sized kernel loops
            # crawl (14.7 s/step observed at full res) — bail, keep params
            if float(np.abs(np.asarray(flow)).max()) > brake:
                print("flows diverging; stopping early", flush=True)
                break

    np.savez_compressed(OUT, **flatten_params(params))
    print(f"saved {OUT} ({os.path.getsize(OUT)/1e6:.1f} MB)", flush=True)


if __name__ == "__main__":
    main()
