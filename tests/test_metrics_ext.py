"""Tests for extended metrics (surface distances, per-class tables, etc.)."""

import numpy as np

from smilecode_tpu.metrics_ext import (
    assd,
    dice_binary,
    dice_val_7voi,
    hd,
    hd95,
    mc_stats,
    pad_image,
    per_class_metrics,
    smooth_seg,
    uce_loss,
)

RNG = np.random.default_rng(11)


def _sphere(center, r, shape=(24, 24, 24)):
    g = np.stack(np.meshgrid(*[np.arange(s) for s in shape], indexing="ij"), -1)
    return (np.linalg.norm(g - np.asarray(center), axis=-1) < r)


def test_dice_binary():
    a = _sphere((12, 12, 12), 6)
    assert dice_binary(a, a) == 1.0
    b = _sphere((14, 12, 12), 6)
    d = dice_binary(a, b)
    assert 0.5 < d < 1.0


def test_surface_distances_shifted_sphere():
    a = _sphere((12, 12, 12), 6)
    b = _sphere((14, 12, 12), 6)
    # a 2-voxel shift: assd ~1, hd ~2
    assert 0.3 < assd(a, b) < 2.0
    assert 1.5 <= hd(a, b) <= 3.5
    assert hd95(a, b) <= hd(a, b)
    assert hd(a, a) == 0.0


def test_per_class_metrics():
    true = np.zeros((16, 16, 16), np.int32)
    true[4:9] = 1
    true[9:14] = 2
    pred = np.roll(true, 1, axis=0)
    rows = per_class_metrics(pred, true, labels=[1, 2], metrics=("dice", "hd95"))
    assert set(rows) == {1, 2}
    assert 0.5 < rows[1]["dice"] < 1.0
    assert np.isfinite(rows[1]["hd95"])


def test_dice_val_7voi():
    seg = RNG.integers(0, 8, (12, 12, 12)).astype(np.int32)
    assert dice_val_7voi(seg, seg) > 0.999


def test_smooth_and_pad():
    a = _sphere((12, 12, 12), 5)
    sm = smooth_seg(a)
    assert sm.dtype == bool and 0 < sm.sum()
    p = pad_image(np.ones((4, 4, 4)), (8, 8, 8))
    assert p.shape == (8, 8, 8) and p.sum() == 64


def test_uncertainty_helpers():
    preds = RNG.random((8, 4, 4, 4))
    mean, var = mc_stats(preds)
    assert mean.shape == (4, 4, 4) and (var >= 0).all()
    uce = uce_loss(RNG.random(100) * 0.1, RNG.random(100) * 0.1)
    assert 0 <= uce < 1
