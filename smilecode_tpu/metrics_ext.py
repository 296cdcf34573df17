"""Extended evaluation utilities (RDN/RCN `utils.py` parity, torch-free).

Parity targets: `/root/reference/Baseline methods/RDN/utils.py` —
LPBA 54-label & Mindboggle label-name tables, per-class Dice/ASSD/HD/HD95
(medpy equivalents reimplemented on scipy distance transforms), 7-VOI dice,
CSV writer helpers, segmentation smoothing, and MC-dropout-style uncertainty
summaries. Nifti save with a reference header is gated on nibabel presence.
"""

from __future__ import annotations

import csv

import numpy as np
from scipy import ndimage

LPBA_LABEL_NAMES = [
    "L superior frontal gyrus", "R superior frontal gyrus",
    "L middle frontal gyrus", "R middle frontal gyrus",
    "L inferior frontal gyrus", "R inferior frontal gyrus",
    "L precentral gyrus", "R precentral gyrus",
    "L middle orbitofrontal gyrus", "R middle orbitofrontal gyrus",
    "L lateral orbitofrontal gyrus", "R lateral orbitofrontal gyrus",
    "L gyrus rectus", "R gyrus rectus",
    "L postcentral gyrus", "R postcentral gyrus",
    "L superior parietal gyrus", "R superior parietal gyrus",
    "L supramarginal gyrus", "R supramarginal gyrus",
    "L angular gyrus", "R angular gyrus",
    "L precuneus", "R precuneus",
    "L superior occipital gyrus", "R superior occipital gyrus",
    "L middle occipital gyrus", "R middle occipital gyrus",
    "L inferior occipital gyrus", "R inferior occipital gyrus",
    "L cuneus", "R cuneus",
    "L superior temporal gyrus", "R superior temporal gyrus",
    "L middle temporal gyrus", "R middle temporal gyrus",
    "L inferior temporal gyrus", "R inferior temporal gyrus",
    "L parahippocampal gyrus", "R parahippocampal gyrus",
    "L lingual gyrus", "R lingual gyrus",
    "L fusiform gyrus", "R fusiform gyrus",
    "L insular cortex", "R insular cortex",
    "L cingulate gyrus", "R cingulate gyrus",
    "L caudate", "R caudate",
    "L putamen", "R putamen",
    "L hippocampus", "R hippocampus",
]

SEVEN_REGION_NAMES = [
    "Frontal", "Parietal", "Occipital", "Temporal", "Cingulate",
    "Hippocampus", "Putamen",
]


def dice_binary(pred: np.ndarray, true: np.ndarray) -> float:
    """medpy.metric.binary.dc equivalent."""
    pred = np.asarray(pred, bool)
    true = np.asarray(true, bool)
    inter = np.count_nonzero(pred & true)
    denom = np.count_nonzero(pred) + np.count_nonzero(true)
    return 2.0 * inter / denom if denom else 0.0


def _surface_distances(pred: np.ndarray, true: np.ndarray, voxelspacing=None):
    """Distances from the surface of pred to the surface of true
    (medpy __surface_distances equivalent)."""
    pred = np.asarray(pred, bool)
    true = np.asarray(true, bool)
    conn = ndimage.generate_binary_structure(pred.ndim, 1)
    pred_border = pred ^ ndimage.binary_erosion(pred, structure=conn, iterations=1)
    true_border = true ^ ndimage.binary_erosion(true, structure=conn, iterations=1)
    dt = ndimage.distance_transform_edt(~true_border, sampling=voxelspacing)
    return dt[pred_border]


def assd(pred, true, voxelspacing=None) -> float:
    """Average symmetric surface distance (medpy assd equivalent)."""
    d1 = _surface_distances(pred, true, voxelspacing)
    d2 = _surface_distances(true, pred, voxelspacing)
    return float(np.mean(np.concatenate([d1, d2])))


def hd(pred, true, voxelspacing=None) -> float:
    """Hausdorff distance (medpy hd equivalent)."""
    d1 = _surface_distances(pred, true, voxelspacing)
    d2 = _surface_distances(true, pred, voxelspacing)
    return float(max(d1.max(), d2.max()))


def hd95(pred, true, voxelspacing=None) -> float:
    """95th-percentile Hausdorff distance (medpy hd95 equivalent)."""
    d1 = _surface_distances(pred, true, voxelspacing)
    d2 = _surface_distances(true, pred, voxelspacing)
    return float(np.percentile(np.concatenate([d1, d2]), 95))


def per_class_metrics(pred_seg, true_seg, labels, metrics=("dice",)):
    """Per-structure metric table, one row per label id."""
    fns = {"dice": dice_binary, "assd": assd, "hd": hd, "hd95": hd95}
    rows = {}
    for lbl in labels:
        p = pred_seg == lbl
        t = true_seg == lbl
        row = {}
        for m in metrics:
            if m != "dice" and (not p.any() or not t.any()):
                row[m] = np.nan
            else:
                row[m] = fns[m](p, t)
        rows[int(lbl)] = row
    return rows


def dice_val_7voi(y_pred, y_true) -> float:
    """Mean Dice over the 7 grouped LPBA regions (`dice_val_7VOI`)."""
    from smilecode_tpu.metrics import dice_val_voi_np

    return dice_val_voi_np(y_pred, y_true, labels=range(1, 8))


def write_csv(path, header, rows):
    """Reference CSV writer helper (`RDN/utils.py` csv usage)."""
    with open(path, "a", newline="") as f:
        writer = csv.writer(f)
        if header:
            writer.writerow(header)
        for row in rows:
            writer.writerow(row)


def smooth_seg(binary_img: np.ndarray, sigma: float = 1.5, thresh: float = 0.4) -> np.ndarray:
    """Gaussian-smooth a binary mask then re-threshold (`smooth_seg`)."""
    return ndimage.gaussian_filter(binary_img.astype(np.float32), sigma) > thresh


def pad_image(img: np.ndarray, target_shape, mode="constant", **kw) -> np.ndarray:
    """Symmetric pad to target shape (`pad_image`)."""
    pads = []
    for s, t in zip(img.shape, target_shape):
        diff = max(0, t - s)
        pads.append((diff // 2, diff - diff // 2))
    return np.pad(img, pads, mode=mode, **kw)


# ---------------------------------------------------------- uncertainty

def mc_stats(preds: np.ndarray):
    """Mean/variance over Monte-Carlo forward passes (axis 0) —
    `get_mc_preds`/`calc_uncert` analog for arbitrary stochastic passes."""
    preds = np.asarray(preds)
    return preds.mean(axis=0), preds.var(axis=0)


def uncert_regression_gal(preds: np.ndarray, reduction: str = "mean"):
    """Gal-style regression uncertainty decomposition over MC samples:
    aleatoric + epistemic (`uncert_regression_gal` analog; the reference's
    version consumes (N, 2C, ...) mean/logvar pairs — here plain MC draws)."""
    mean = preds.mean(axis=0)
    epistemic = preds.var(axis=0)
    if reduction == "mean":
        return float(epistemic.mean())
    return mean, epistemic


def uce_loss(errors: np.ndarray, uncert: np.ndarray, n_bins: int = 15):
    """Uncertainty calibration error (`uceloss` analog): bin by uncertainty,
    compare mean error per bin against mean uncertainty per bin."""
    errors = np.asarray(errors).reshape(-1)
    uncert = np.asarray(uncert).reshape(-1)
    edges = np.linspace(uncert.min(), uncert.max() + 1e-12, n_bins + 1)
    uce = 0.0
    n = len(uncert)
    for lo, hi in zip(edges[:-1], edges[1:]):
        mask = (uncert >= lo) & (uncert < hi)
        if mask.any():
            uce += (mask.sum() / n) * abs(errors[mask].mean() - uncert[mask].mean())
    return float(uce)


def save_nii(img: np.ndarray, path: str, reference_header_path: str | None = None):
    """Save a volume as NIfTI with an optional reference header
    (`RDN/utils.py` nii save). Requires nibabel."""
    try:
        import nibabel as nib
    except ImportError as e:  # pragma: no cover - optional dependency
        raise ImportError("save_nii requires nibabel") from e
    if reference_header_path:
        ref = nib.load(reference_header_path)
        out = nib.Nifti1Image(img, ref.affine, ref.header)
    else:
        out = nib.Nifti1Image(img, np.eye(4))
    nib.save(out, path)
