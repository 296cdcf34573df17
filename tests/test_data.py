"""Data pipeline tests: pair math, transforms, loader, preprocessing."""

import os
import pickle

import numpy as np
import pytest

from smilecode_tpu.data import (
    Compose,
    Loader,
    LPBABrainDatasetS2S,
    LPBABrainInferDatasetS2S,
    NumpyType,
    Seg_norm,
)
from smilecode_tpu.data.datasets import pair_indices
from smilecode_tpu.data.preprocess import center, crop_by_center, process_subject
from smilecode_tpu.data.trans import LPBA_SEG_TABLE

RNG = np.random.default_rng(4)


@pytest.fixture(scope="module")
def pkl_dir(tmp_path_factory):
    d = tmp_path_factory.mktemp("lpba")
    for i in range(4):
        img = RNG.random((12, 14, 12)).astype(np.float32)
        seg = RNG.choice(LPBA_SEG_TABLE, (12, 14, 12)).astype(np.uint16)
        with open(d / f"subject_{i:02d}.pkl", "wb") as f:
            pickle.dump((img, seg), f)
    return d


def paths(d):
    return sorted(str(p) for p in d.iterdir())


class TestPairIndices:
    def test_all_ordered_pairs(self):
        n = 5
        pairs = {pair_indices(i, n) for i in range(n * (n - 1))}
        assert len(pairs) == n * (n - 1)
        assert all(x != y for x, y in pairs)
        assert all(0 <= x < n and 0 <= y < n for x, y in pairs)

    def test_reference_examples(self):
        # x = i // (n-1); s = i % (n-1); y = s+1 if s >= x else s
        assert pair_indices(0, 4) == (0, 1)
        assert pair_indices(3, 4) == (1, 0)
        assert pair_indices(4, 4) == (1, 2)


class TestTransforms:
    def test_seg_norm_remaps(self):
        seg = np.array([[0, 21, 166], [34, 50, 99]])
        out = Seg_norm().tf(seg, k=1)
        assert out[0, 0] == 0 and out[0, 1] == 1 and out[0, 2] == 54
        assert out[1, 2] == 0  # unknown label -> 0
        # image (k=0) untouched
        img = RNG.random((3, 3))
        assert Seg_norm().tf(img, k=0) is img

    def test_numpy_type(self):
        img = RNG.random((2, 3, 3, 3))
        x, y = Compose([NumpyType((np.float32, np.int16))])([img, img])
        assert x.dtype == np.float32 and y.dtype == np.int16


class TestDatasets:
    def test_train_dataset(self, pkl_dir):
        tfm = Compose([NumpyType((np.float32, np.float32))])
        ds = LPBABrainDatasetS2S(paths(pkl_dir), tfm)
        assert len(ds) == 4 * 3
        x, y = ds[0]
        assert x.shape == (1, 12, 14, 12) and x.dtype == np.float32

    def test_infer_dataset(self, pkl_dir):
        tfm = Compose([Seg_norm(), NumpyType((np.float32, np.int16))])
        ds = LPBABrainInferDatasetS2S(paths(pkl_dir), tfm)
        x, y, xs, ys = ds[5]
        assert xs.dtype == np.int16
        assert xs.max() <= 54


class TestLoader:
    @pytest.mark.parametrize("workers", [0, 2])
    def test_batching_and_order(self, pkl_dir, workers):
        tfm = Compose([NumpyType((np.float32, np.float32))])
        ds = LPBABrainDatasetS2S(paths(pkl_dir), tfm)
        loader = Loader(ds, batch_size=2, shuffle=False, num_workers=workers,
                        device_put=False)
        batches = list(loader)
        assert len(batches) == 6
        x, y = batches[0]
        assert x.shape == (2, 12, 14, 12, 1)  # NDHWC
        # determinism without shuffle: item 0 equals dataset[0]
        ref_x, _ = ds[0]
        np.testing.assert_array_equal(x[0, ..., 0], ref_x[0])

    def test_shuffle_changes_order(self, pkl_dir):
        tfm = Compose([NumpyType((np.float32, np.float32))])
        ds = LPBABrainDatasetS2S(paths(pkl_dir), tfm)
        l1 = list(Loader(ds, 1, shuffle=True, seed=1, num_workers=0, device_put=False))
        l2 = list(Loader(ds, 1, shuffle=True, seed=2, num_workers=0, device_put=False))
        diff = any(
            not np.array_equal(a[0], b[0]) for a, b in zip(l1, l2)
        )
        assert diff


class TestPreprocess:
    def test_center_rule(self):
        arr = np.zeros((10, 10, 10))
        arr[2:8, 3:9, 4:6] = 1.0
        c = center(arr)
        # midpoint of sorted nonzero index extremes per axis
        assert list(c) == [(2 + 7) // 2, (3 + 8) // 2, (4 + 5) // 2]

    def test_crop_clamps(self):
        img = RNG.random((20, 30, 20))
        out = crop_by_center(img, [1, 15, 19], final_shape=(16, 24, 16))
        assert out.shape == (16, 24, 16)

    def test_process_subject(self):
        img = RNG.random((200, 220, 200)) * 100
        img[:20] = 0
        lbl = RNG.integers(0, 166, (200, 220, 200)).astype(np.int32)
        pimg, plbl = process_subject(img, lbl)
        assert pimg.shape == (160, 192, 160) and pimg.dtype == np.float32
        assert plbl.dtype == np.uint16
        assert 0.0 <= pimg.min() and pimg.max() <= 1.0
