"""Independent torch (CPU) re-implementations of the reference ops, used as
parity oracles in tests. These follow the published semantics of the reference
(`/root/reference/ModeT/models.py`, `losses.py`) but are written fresh here —
notably without the hardcoded .cuda() calls — so the suite runs on CPU."""

import math

import numpy as np
import torch
import torch.nn.functional as F


def torch_warp(src, flow, mode="bilinear"):
    """SpatialTransformer semantics: sample src at grid+flow (NCDHW, voxel units)."""
    shape = flow.shape[2:]
    vectors = [torch.arange(0, s) for s in shape]
    grids = torch.meshgrid(*vectors, indexing="ij")
    grid = torch.stack(grids).unsqueeze(0).float()
    new_locs = grid + flow
    for i in range(len(shape)):
        new_locs[:, i] = 2 * (new_locs[:, i] / (shape[i] - 1) - 0.5)
    new_locs = new_locs.permute(0, 2, 3, 4, 1)[..., [2, 1, 0]]
    return F.grid_sample(src, new_locs, align_corners=True, mode=mode)


def torch_vecint(vec, nsteps=7):
    vec = vec * (1.0 / 2 ** nsteps)
    for _ in range(nsteps):
        vec = vec + torch_warp(vec, vec)
    return vec


def torch_ncc(y_true, y_pred, win=9):
    ii, ji = y_true, y_pred
    sum_filt = torch.ones([1, 1, win, win, win])
    pad_no = win // 2
    conv = lambda x: F.conv3d(x, sum_filt, stride=1, padding=pad_no)
    i2, j2, ij = ii * ii, ji * ji, ii * ji
    i_sum, j_sum = conv(ii), conv(ji)
    i2_sum, j2_sum, ij_sum = conv(i2), conv(j2), conv(ij)
    win_size = win ** 3
    u_i, u_j = i_sum / win_size, j_sum / win_size
    cross = ij_sum - u_j * i_sum - u_i * j_sum + u_i * u_j * win_size
    i_var = i2_sum - 2 * u_i * i_sum + u_i * u_i * win_size
    j_var = j2_sum - 2 * u_j * j_sum + u_j * u_j * win_size
    cc = cross * cross / (i_var * j_var + 1e-5)
    return -torch.mean(cc)


def torch_grad3d(flow, penalty="l1"):
    dy = torch.abs(flow[:, :, 1:] - flow[:, :, :-1])
    dx = torch.abs(flow[:, :, :, 1:] - flow[:, :, :, :-1])
    dz = torch.abs(flow[:, :, :, :, 1:] - flow[:, :, :, :, :-1])
    if penalty == "l2":
        dy, dx, dz = dy * dy, dx * dx, dz * dz
    return (torch.mean(dx) + torch.mean(dy) + torch.mean(dz)) / 3.0


def torch_neighborhood_attention(q, k, rpb, scale):
    """Pure-torch unfold formulation (B, H, W, T, C) -> (B, heads*3, H, W, T)."""
    num_heads = rpb.shape[0]
    B, H, W, T, C = q.shape
    N = H * W * T
    ks = 3
    num_tokens = ks ** 3
    q = q.reshape(B, N, num_heads, C // num_heads, 1).transpose(3, 4) * scale
    kk = k.permute(0, 4, 1, 2, 3)
    kk = F.pad(kk, (1, 1, 1, 1, 1, 1))
    kk = kk.flatten(0, 1)
    kk = (
        kk.unfold(1, ks, 1).unfold(2, ks, 1).unfold(3, ks, 1).permute(0, 4, 5, 6, 1, 2, 3)
    )
    kk = kk.reshape(B, num_heads, C // num_heads, num_tokens, N)
    kk = kk.permute(0, 4, 1, 3, 2)
    attn = q @ kk.transpose(-2, -1)
    bias_idx = torch.arange(num_tokens).unsqueeze(-1).repeat(N, 1)
    attn = attn + rpb.flatten(1, 3)[:, bias_idx].reshape(num_heads, N, 1, num_tokens).transpose(0, 1)
    attn = attn.softmax(dim=-1)
    r = torch.arange(-1, 2).float()
    grids = torch.meshgrid(r, r, r, indexing="ij")
    offs = torch.stack(grids, -1).reshape(num_tokens, 3)
    v = offs.unsqueeze(0).unsqueeze(0).repeat(N, num_heads, 1, 1).unsqueeze(0)
    x = attn @ v
    return x.reshape(B, H, W, T, num_heads * 3).permute(0, 4, 1, 2, 3)
