"""Extended losses of the RCN/RDN baselines (channels-last JAX).

Parity: `/root/reference/Baseline methods/RCN/losses.py` —
SSIM 2D/3D (Gaussian window sigma=1.5, win=11), `Grad` (2D), `Grad3DiTV`
(isotropic TV), `DisplacementRegularizer` (central-difference gradient-l1/l2
and bending energy), `MIND_loss` (MIND-SSC descriptor MSE), and Parzen
`MutualInformation` + patch `localMutualInformation`.
"""

from __future__ import annotations

import math

import jax
import jax.numpy as jnp
import numpy as np


# ---------------------------------------------------------------- SSIM

def gaussian_window(window_size: int, sigma: float = 1.5) -> np.ndarray:
    g = np.array(
        [math.exp(-((x - window_size // 2) ** 2) / (2 * sigma ** 2)) for x in range(window_size)],
        np.float32,
    )
    return g / g.sum()


def _sep_conv(x: jax.Array, kernel1d: np.ndarray, axes) -> jax.Array:
    """Depthwise separable conv with zero padding win//2 along given axes."""
    win = len(kernel1d)
    pad = win // 2
    c = x.shape[-1]
    for axis in axes:
        kshape = [1, 1, 1][: x.ndim - 2]
        kshape = [1] * (x.ndim - 2)
        kshape[axis - 1] = win
        k = jnp.asarray(kernel1d, x.dtype).reshape(*kshape, 1, 1)
        k = jnp.tile(k, [1] * (x.ndim - 2) + [1, c])
        pads = [(0, 0)] * (x.ndim - 2)
        pads[axis - 1] = (pad, pad)
        dn = ("NDHWC", "DHWIO", "NDHWC") if x.ndim == 5 else ("NHWC", "HWIO", "NHWC")
        x = jax.lax.conv_general_dilated(
            x, k, window_strides=(1,) * (x.ndim - 2), padding=pads,
            dimension_numbers=dn, feature_group_count=c,
        )
    return x


def _ssim_map(img1, img2, window_size):
    g = gaussian_window(window_size)
    axes = tuple(range(1, img1.ndim - 1))
    conv = lambda x: _sep_conv(x, g, axes)
    mu1, mu2 = conv(img1), conv(img2)
    mu1_sq, mu2_sq, mu1_mu2 = mu1 * mu1, mu2 * mu2, mu1 * mu2
    sigma1_sq = conv(img1 * img1) - mu1_sq
    sigma2_sq = conv(img2 * img2) - mu2_sq
    sigma12 = conv(img1 * img2) - mu1_mu2
    c1, c2 = 0.01 ** 2, 0.03 ** 2
    return ((2 * mu1_mu2 + c1) * (2 * sigma12 + c2)) / (
        (mu1_sq + mu2_sq + c1) * (sigma1_sq + sigma2_sq + c2)
    )


def ssim2d(img1, img2, window_size: int = 11):
    """Mean SSIM over (B, H, W, C) images (reference `ssim`)."""
    return jnp.mean(_ssim_map(img1, img2, window_size))


def ssim3d(img1, img2, window_size: int = 11):
    """Mean SSIM over (B, D, H, W, C) volumes (reference `ssim3D`)."""
    return jnp.mean(_ssim_map(img1, img2, window_size))


def ssim3d_loss(img1, img2, window_size: int = 11):
    """1 - SSIM (the reference SSIM3D module's return)."""
    return 1.0 - ssim3d(img1, img2, window_size)


# ---------------------------------------------------------- gradients / TV

def grad2d(flow, penalty: str = "l1", loss_mult=None):
    """2D Grad loss over (B, H, W, C)."""
    dy = jnp.abs(flow[:, 1:] - flow[:, :-1])
    dx = jnp.abs(flow[:, :, 1:] - flow[:, :, :-1])
    if penalty == "l2":
        dy, dx = dy * dy, dx * dx
    g = (jnp.mean(dx) + jnp.mean(dy)) / 2.0
    if loss_mult is not None:
        g = g * loss_mult
    return g


def grad3d_itv(flow):
    """Isotropic total variation (`Grad3DiTV`), flow (B, D, H, W, C)."""
    dy = flow[:, 1:, 1:, 1:] - flow[:, :-1, 1:, 1:]
    dx = flow[:, 1:, 1:, 1:] - flow[:, 1:, :-1, 1:]
    dz = flow[:, 1:, 1:, 1:] - flow[:, 1:, 1:, :-1]
    return jnp.mean(jnp.sqrt(dx * dx + dy * dy + dz * dz + 1e-6)) / 3.0


def _grad_c(fv, axis):
    """Central difference on the interior (DisplacementRegularizer)."""
    sl = [slice(1, -1)] * 3
    up = list(sl)
    dn = list(sl)
    up[axis] = slice(2, None)
    dn[axis] = slice(0, -2)
    return (fv[(slice(None), *up)] - fv[(slice(None), *dn)]) / 2


def displacement_regularizer(disp, energy_type: str = "bending"):
    """`DisplacementRegularizer` parity; disp (B, D, H, W, 3) channels-last.

    The reference stacks per-component central-difference gradients
    (`RCN/losses.py:223-268`).
    """
    comps = [disp[..., i] for i in range(disp.shape[-1])]  # (B,D,H,W) each

    def gradient_txyz(fields, fn):
        return [fn(f) for f in fields]

    dtdx = gradient_txyz(comps, lambda f: _grad_c(f, 0))
    dtdy = gradient_txyz(comps, lambda f: _grad_c(f, 1))
    dtdz = gradient_txyz(comps, lambda f: _grad_c(f, 2))

    def stack_mean(fn):
        return jnp.mean(jnp.stack([fn(a, b, c) for a, b, c in zip(dtdx, dtdy, dtdz)]))

    if energy_type == "gradient-l2":
        return stack_mean(lambda x, y, z: x ** 2 + y ** 2 + z ** 2) / 3.0
    if energy_type == "gradient-l1":
        return stack_mean(lambda x, y, z: jnp.abs(x) + jnp.abs(y) + jnp.abs(z)) / 3.0
    if energy_type == "bending":
        dxx = gradient_txyz(dtdx, lambda f: _grad_c(f, 0))
        dyy = gradient_txyz(dtdy, lambda f: _grad_c(f, 1))
        dzz = gradient_txyz(dtdz, lambda f: _grad_c(f, 2))
        dxy = gradient_txyz(dtdx, lambda f: _grad_c(f, 1))
        dyz = gradient_txyz(dtdy, lambda f: _grad_c(f, 2))
        dxz = gradient_txyz(dtdx, lambda f: _grad_c(f, 2))
        return jnp.mean(
            jnp.stack(
                [
                    a ** 2 + b ** 2 + c ** 2 + 2 * d ** 2 + 2 * e ** 2 + 2 * f ** 2
                    for a, b, c, d, e, f in zip(dxx, dyy, dzz, dxy, dxz, dyz)
                ]
            )
        )
    raise ValueError(f"Not recognised local regulariser: {energy_type}")


# ---------------------------------------------------------------- MIND-SSC

_SIX_NEIGH = np.array(
    [[0, 1, 1], [1, 1, 0], [1, 0, 1], [1, 1, 2], [2, 1, 1], [1, 2, 1]], np.int64
)


def _mind_shift_pairs():
    sn = _SIX_NEIGH
    d2 = ((sn[:, None, :] - sn[None, :, :]) ** 2).sum(-1)
    x, y = np.meshgrid(np.arange(6), np.arange(6), indexing="ij")
    mask = (x > y).reshape(-1) & (d2 == 2).reshape(-1)
    idx1 = np.repeat(sn[:, None, :], 6, 1).reshape(-1, 3)[mask]
    idx2 = np.repeat(sn[None, :, :], 6, 0).reshape(-1, 3)[mask]
    return idx1, idx2


def _rep_pad(x, p):
    return jnp.pad(x, ((0, 0), (p, p), (p, p), (p, p), (0, 0)), mode="edge")


def _shift3d(xp, offs, size):
    d, h, w = size
    od, oh, ow = offs
    return xp[:, od : od + d, oh : oh + h, ow : ow + w, :]


def mind_ssc(img, radius: int = 2, dilation: int = 2):
    """MIND-SSC descriptor, (B, D, H, W, 1) -> (B, D, H, W, 12)."""
    b, d, h, w, _ = img.shape
    kernel_size = radius * 2 + 1
    idx1, idx2 = _mind_shift_pairs()
    xp = _rep_pad(img, dilation)
    diffs = []
    for i in range(12):
        s1 = _shift3d(xp, tuple(idx1[i] * dilation), (d, h, w))
        s2 = _shift3d(xp, tuple(idx2[i] * dilation), (d, h, w))
        diffs.append((s1 - s2) ** 2)
    diff = jnp.concatenate(diffs, axis=-1)  # (B, D, H, W, 12)
    # avg_pool(kernel, stride 1) over replication-padded volume
    dp = _rep_pad(diff, radius)
    ssd = jnp.zeros_like(diff)
    for od in range(kernel_size):
        for oh in range(kernel_size):
            for ow in range(kernel_size):
                ssd = ssd + _shift3d(dp, (od, oh, ow), (d, h, w))
    ssd = ssd / (kernel_size ** 3)
    mind = ssd - jnp.min(ssd, axis=-1, keepdims=True)
    mind_var = jnp.mean(mind, axis=-1, keepdims=True)
    mv_mean = jnp.mean(mind_var)
    mind_var = jnp.clip(mind_var, mv_mean * 0.001, mv_mean * 1000)
    mind = jnp.exp(-mind / mind_var)
    perm = np.array([6, 8, 1, 11, 2, 10, 0, 7, 9, 4, 5, 3])
    return mind[..., perm]


def mind_loss(y_pred, y_true):
    """MSE between MIND-SSC descriptors (`MIND_loss`)."""
    return jnp.mean((mind_ssc(y_pred) - mind_ssc(y_true)) ** 2)


# ---------------------------------------------------- mutual information

def mutual_information(
    y_true, y_pred, sigma_ratio: float = 1.0, minval: float = 0.0,
    maxval: float = 1.0, num_bin: int = 32,
):
    """Global Parzen-window MI loss (returns -MI, `MutualInformation`)."""
    bin_centers = np.linspace(minval, maxval, num_bin)
    sigma = np.mean(np.diff(bin_centers)) * sigma_ratio
    preterm = 1.0 / (2 * sigma ** 2)
    vbc = jnp.asarray(bin_centers, jnp.float32).reshape(1, 1, num_bin)

    yt = jnp.clip(y_true, minval, maxval).reshape(y_true.shape[0], -1, 1)
    yp = jnp.clip(y_pred, minval, maxval).reshape(y_pred.shape[0], -1, 1)
    nvox = yp.shape[1]

    i_a = jnp.exp(-preterm * (yt - vbc) ** 2)
    i_a = i_a / jnp.sum(i_a, axis=-1, keepdims=True)
    i_b = jnp.exp(-preterm * (yp - vbc) ** 2)
    i_b = i_b / jnp.sum(i_b, axis=-1, keepdims=True)

    pab = jnp.einsum("bnc,bnd->bcd", i_a, i_b) / nvox
    pa = jnp.mean(i_a, axis=1, keepdims=True)
    pb = jnp.mean(i_b, axis=1, keepdims=True)
    papb = jnp.einsum("bnc,bnd->bcd", pa, pb) + 1e-6
    mi = jnp.sum(pab * jnp.log(pab / papb + 1e-6), axis=(1, 2))
    return -jnp.mean(mi)


def local_mutual_information(
    y_true, y_pred, sigma_ratio: float = 1.0, minval: float = 0.0,
    maxval: float = 1.0, num_bin: int = 32, patch_size: int = 5,
):
    """Patch-wise (non-overlapping) MI loss (`localMutualInformation`)."""
    bin_centers = np.linspace(minval, maxval, num_bin)
    sigma = np.mean(np.diff(bin_centers)) * sigma_ratio
    preterm = 1.0 / (2 * sigma ** 2)
    vbc = jnp.asarray(bin_centers, jnp.float32).reshape(1, 1, num_bin)
    ps = patch_size

    yt = jnp.clip(y_true, minval, maxval)
    yp = jnp.clip(y_pred, minval, maxval)
    b, d, h, w, c = yt.shape
    dr, hr, wr = (-d) % ps, (-h) % ps, (-w) % ps
    pads = (
        (0, 0),
        (dr // 2, dr - dr // 2),
        (hr // 2, hr - hr // 2),
        (wr // 2, wr - wr // 2),
        (0, 0),
    )
    yt = jnp.pad(yt, pads)
    yp = jnp.pad(yp, pads)

    def to_patches(x):
        dd, hh, ww = d + dr, h + hr, w + wr
        x = x.transpose(0, 4, 1, 2, 3)  # channel-first like the reference
        x = x.reshape(b, c, dd // ps, ps, hh // ps, ps, ww // ps, ps)
        x = x.transpose(0, 1, 2, 4, 6, 3, 5, 7)
        return x.reshape(-1, ps ** 3, 1)

    tp, pp = to_patches(yt), to_patches(yp)
    i_a = jnp.exp(-preterm * (tp - vbc) ** 2)
    i_a = i_a / jnp.sum(i_a, axis=-1, keepdims=True)
    i_b = jnp.exp(-preterm * (pp - vbc) ** 2)
    i_b = i_b / jnp.sum(i_b, axis=-1, keepdims=True)

    pab = jnp.einsum("bnc,bnd->bcd", i_a, i_b) / (ps ** 3)
    pa = jnp.mean(i_a, axis=1, keepdims=True)
    pb = jnp.mean(i_b, axis=1, keepdims=True)
    papb = jnp.einsum("bnc,bnd->bcd", pa, pb) + 1e-6
    mi = jnp.sum(pab * jnp.log(pab / papb + 1e-6), axis=(1, 2))
    return -jnp.mean(mi)
