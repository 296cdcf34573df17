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


# ------------------------- extended losses (RCN/RDN zoo) -------------------

def _gauss1d(ws, sigma=1.5):
    g = torch.tensor([math.exp(-((x - ws // 2) ** 2) / (2 * sigma ** 2)) for x in range(ws)])
    return g / g.sum()


def torch_ssim3d(img1, img2, ws=11):
    g = _gauss1d(ws)
    w2 = g.unsqueeze(1) @ g.unsqueeze(0)
    w3 = (g.unsqueeze(1) @ w2.reshape(1, -1)).reshape(ws, ws, ws)[None, None]
    c = img1.shape[1]
    w3 = w3.expand(c, 1, ws, ws, ws).contiguous()
    conv = lambda x: F.conv3d(x, w3, padding=ws // 2, groups=c)
    mu1, mu2 = conv(img1), conv(img2)
    s1 = conv(img1 * img1) - mu1 ** 2
    s2 = conv(img2 * img2) - mu2 ** 2
    s12 = conv(img1 * img2) - mu1 * mu2
    C1, C2 = 0.01 ** 2, 0.03 ** 2
    m = ((2 * mu1 * mu2 + C1) * (2 * s12 + C2)) / ((mu1 ** 2 + mu2 ** 2 + C1) * (s1 + s2 + C2))
    return m.mean()


def torch_displacement_regularizer(disp, energy_type):
    gdx = lambda fv: (fv[:, 2:, 1:-1, 1:-1] - fv[:, :-2, 1:-1, 1:-1]) / 2
    gdy = lambda fv: (fv[:, 1:-1, 2:, 1:-1] - fv[:, 1:-1, :-2, 1:-1]) / 2
    gdz = lambda fv: (fv[:, 1:-1, 1:-1, 2:] - fv[:, 1:-1, 1:-1, :-2]) / 2
    gt = lambda T, fn: torch.stack([fn(T[:, i]) for i in range(3)], dim=1)
    dTdx, dTdy, dTdz = gt(disp, gdx), gt(disp, gdy), gt(disp, gdz)
    if energy_type == "gradient-l2":
        return torch.mean(dTdx ** 2 + dTdy ** 2 + dTdz ** 2) / 3.0
    if energy_type == "gradient-l1":
        return torch.mean(dTdx.abs() + dTdy.abs() + dTdz.abs()) / 3.0
    dxx, dyy, dzz = gt(dTdx, gdx), gt(dTdy, gdy), gt(dTdz, gdz)
    dxy, dyz, dxz = gt(dTdx, gdy), gt(dTdy, gdz), gt(dTdx, gdz)
    return torch.mean(dxx**2 + dyy**2 + dzz**2 + 2*dxy**2 + 2*dxz**2 + 2*dyz**2)


def torch_mind_ssc(img, radius=2, dilation=2):
    import torch.nn as nn
    ks = radius * 2 + 1
    sn = torch.tensor([[0,1,1],[1,1,0],[1,0,1],[1,1,2],[2,1,1],[1,2,1]]).long()
    xx = (sn.t().unsqueeze(0) ** 2).sum(dim=1).unsqueeze(2)
    dist = (xx + xx.permute(0,2,1) - 2.0 * torch.bmm(sn.t().unsqueeze(0).permute(0,2,1), sn.t().unsqueeze(0))).squeeze(0)
    dist = torch.clamp(dist, 0.0, float("inf"))
    x, y = torch.meshgrid(torch.arange(6), torch.arange(6), indexing="ij")
    mask = ((x > y).reshape(-1) & (dist == 2).reshape(-1))
    idx1 = sn.unsqueeze(1).repeat(1, 6, 1).view(-1, 3)[mask]
    idx2 = sn.unsqueeze(0).repeat(6, 1, 1).view(-1, 3)[mask]
    m1 = torch.zeros(12, 1, 3, 3, 3)
    m1.view(-1)[torch.arange(12) * 27 + idx1[:, 0] * 9 + idx1[:, 1] * 3 + idx1[:, 2]] = 1
    m2 = torch.zeros(12, 1, 3, 3, 3)
    m2.view(-1)[torch.arange(12) * 27 + idx2[:, 0] * 9 + idx2[:, 1] * 3 + idx2[:, 2]] = 1
    rpad1, rpad2 = nn.ReplicationPad3d(dilation), nn.ReplicationPad3d(radius)
    ssd = F.avg_pool3d(
        rpad2((F.conv3d(rpad1(img), m1, dilation=dilation) - F.conv3d(rpad1(img), m2, dilation=dilation)) ** 2),
        ks, stride=1)
    mind = ssd - torch.min(ssd, 1, keepdim=True)[0]
    mv = torch.mean(mind, 1, keepdim=True)
    mv = torch.clamp(mv, (mv.mean() * 0.001).item(), (mv.mean() * 1000).item())
    mind = torch.exp(-mind / mv)
    return mind[:, torch.tensor([6, 8, 1, 11, 2, 10, 0, 7, 9, 4, 5, 3]).long()]


def torch_mutual_information(y_true, y_pred, num_bin=32, minval=0.0, maxval=1.0, sigma_ratio=1.0):
    bin_centers = np.linspace(minval, maxval, num=num_bin)
    sigma = np.mean(np.diff(bin_centers)) * sigma_ratio
    preterm = 1 / (2 * sigma ** 2)
    vbc = torch.linspace(minval, maxval, num_bin).reshape(1, 1, -1)
    yt = torch.clamp(y_true, 0, maxval).reshape(y_true.shape[0], -1).unsqueeze(2)
    yp = torch.clamp(y_pred, 0, maxval).reshape(y_pred.shape[0], -1).unsqueeze(2)
    nvox = yp.shape[1]
    I_a = torch.exp(-preterm * (yt - vbc) ** 2); I_a = I_a / I_a.sum(-1, keepdim=True)
    I_b = torch.exp(-preterm * (yp - vbc) ** 2); I_b = I_b / I_b.sum(-1, keepdim=True)
    pab = torch.bmm(I_a.permute(0, 2, 1), I_b) / nvox
    pa, pb = I_a.mean(1, keepdim=True), I_b.mean(1, keepdim=True)
    papb = torch.bmm(pa.permute(0, 2, 1), pb) + 1e-6
    return -(pab * torch.log(pab / papb + 1e-6)).sum(dim=(1, 2)).mean()
