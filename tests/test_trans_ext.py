"""Smoke/behavior tests for the extended transform zoo."""

import numpy as np

from smilecode_tpu.data.trans import Compose, NumpyType
from smilecode_tpu.data import trans_ext as T

RNG = np.random.default_rng(8)


def _img(c=None):
    if c:
        return RNG.random((1, 10, 12, 10, c)).astype(np.float32)
    return RNG.random((1, 10, 12, 10)).astype(np.float32)


def test_center_and_rand_crop():
    img = _img()
    t = T.CenterCrop(8)
    out, = t([img])
    assert out.shape == (1, 8, 8, 8)
    t2 = T.RandCrop3D((8, 6, 4))
    out2, = t2([img])
    assert out2.shape == (1, 8, 6, 4)


def test_pad_and_pad_if_needed():
    img = _img(c=1)
    seg = _img()
    t = T.Pad3DIfNeeded((12, 12, 12))
    a, b = t([img, seg])
    assert a.shape == (1, 12, 12, 12, 1)
    assert b.shape == (1, 12, 12, 12)


def test_flips_deterministic():
    img = _img()
    t = T.Flip(1)
    out = t.tf(img)
    np.testing.assert_array_equal(np.asarray(out), img[:, ::-1])


def test_random_flip_consistent_across_pair():
    img, seg = _img(), _img()
    t = T.RandomFlip()
    np.random.seed(3)
    a, b = t([img, seg])
    # same flip decisions applied to both list elements
    assert (np.array_equal(a, img[:, ::-1]) == np.array_equal(b, seg[:, ::-1]))


def test_intensity_and_gamma_leave_labels():
    img, seg = _img(c=1), _img()
    t = T.RandomIntensityChange((0.1, 0.1))
    a, b = t([img, seg])
    assert not np.array_equal(a, img)
    assert np.array_equal(b, seg)


def test_minmax_and_normalize():
    img = _img()
    out = T.MinMax_norm().tf(img)
    assert 0.0 <= out.min() and out.max() <= 1.0 + 1e-6
    out2 = T.Normalize(0.5, 2.0).tf(img)
    np.testing.assert_allclose(out2, (img - 0.5) / 2.0)


def test_seg_norm_7regions():
    seg = np.array([[21, 41, 61], [81, 121, 165]])[None]
    out = T.Seg_norm_7regions_FAIM().tf(seg, k=1)
    assert out.tolist() == [[[1, 2, 3], [4, 5, 6]]]


def test_gaussian_blur_and_noise():
    img = _img(c=1)
    t = T.GaussianBlur(3, T.Constant(1.5), app=1)
    out = t.tf(img.copy(), k=0)
    assert out.std() < img.std()  # blurred
    assert np.array_equal(t.tf(img.copy(), k=1), img)  # app=1 skips labels
    n = T.Noise(3, sigma=0.1)
    assert not np.array_equal(n.tf(img.copy()), img)


def test_resize_img():
    img, seg = _img(c=1), _img()
    t = T.Resize_img((5, 6, 5))
    a = t.tf(img, k=0)
    b = t.tf(seg, k=1)
    assert a.shape == (1, 5, 6, 5, 1)
    assert b.shape == (1, 5, 6, 5)


def test_rot90_and_randselect():
    img = _img()
    out = T.Rot90((1, 2)).tf(img)
    assert out.shape == (1, 12, 10, 10)
    rs = T.RandSelect(prob=0.0, tf=T.Flip(1))
    a, = rs([img])
    np.testing.assert_array_equal(a, img)
