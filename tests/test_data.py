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

    @staticmethod
    def _write_analyze(dirpath, name, vol, gz=True):
        """Write a minimal Analyze 7.5 .hdr + .img[.gz] pair.

        Buffer layout is the Analyze standard: x fastest, then y, then z —
        i.e. `vol` indexed (z, y, x) is serialized with np.tobytes() (C order,
        last axis fastest) directly."""
        import gzip
        import struct

        dz, dy, dx = vol.shape
        hdr = bytearray(348)
        struct.pack_into("<i", hdr, 0, 348)  # sizeof_hdr (sets endianness)
        # dim[0..3] = ndim, dx, dy, dz at byte offset 40
        struct.pack_into("<4h", hdr, 40, 3, dx, dy, dz)
        datatype = {np.dtype("uint8"): 2, np.dtype("int16"): 4,
                    np.dtype("float32"): 16}[vol.dtype]
        struct.pack_into("<h", hdr, 70, datatype)
        with open(os.path.join(dirpath, name + ".hdr"), "wb") as f:
            f.write(hdr)
        img_path = os.path.join(dirpath, name + ".img" + (".gz" if gz else ""))
        opener = gzip.open if gz else open
        with opener(img_path, "wb") as f:
            f.write(vol.tobytes())
        return img_path

    def test_analyze_reader_roundtrip(self, tmp_path):
        """Orientation round-trip: a known asymmetric (z, y, x) pattern must
        come back in (z, y, x) index order — the SimpleITK GetArrayFromImage
        convention the reference crops in (makePklDataset.py:12-13)."""
        from smilecode_tpu.data.preprocess import _read_analyze_img_gz

        dz, dy, dx = 5, 7, 11  # pairwise-distinct extents catch axis swaps
        vol = np.arange(dz * dy * dx, dtype=np.float32).reshape(dz, dy, dx)
        vol[1, 2, 3] = -99.0  # asymmetric marker
        path = self._write_analyze(str(tmp_path), "toy_skullstripped", vol)
        back = _read_analyze_img_gz(path)
        assert back.shape == (dz, dy, dx)
        np.testing.assert_array_equal(back, vol)
        # int16 + uncompressed + big-endian-free path for the label reader
        lbl = RNG.integers(0, 100, (dz, dy, dx)).astype(np.int16)
        lpath = self._write_analyze(str(tmp_path), "toy_label", lbl, gz=False)
        np.testing.assert_array_equal(_read_analyze_img_gz(lpath), lbl)

    def test_make_pkl_dataset_end_to_end(self, tmp_path):
        """Full driver on synthetic Analyze subjects: crop shapes AND
        orientation (marker voxel survives at the predicted post-crop index)."""
        from smilecode_tpu.data.preprocess import make_pkl_dataset

        dz, dy, dx = 24, 30, 20
        img = np.zeros((dz, dy, dx), dtype=np.float32)
        img[4:20, 5:25, 3:17] = 1.0
        img[6, 7, 5] = 9.0  # asymmetric marker inside the brain
        lbl = (img > 0).astype(np.int16) * 21
        raw = tmp_path / "raw"
        raw.mkdir()
        self._write_analyze(str(raw), "S01.skullstripped", img)
        self._write_analyze(str(raw), "S01.label", lbl)
        out = tmp_path / "pkl"
        make_pkl_dataset(str(raw), str(out), shape=(16, 24, 16), verbose=False)
        with open(out / "subject_01.pkl", "rb") as f:
            pimg, plbl = pickle.load(f)
        assert pimg.shape == (16, 24, 16) and pimg.dtype == np.float32
        assert plbl.shape == (16, 24, 16) and plbl.dtype == np.uint16
        # reproduce the reference crop math on the numpy volume and check the
        # marker lands at the same place with value 1.0 (max after minmax)
        c = center(img)
        ref = crop_by_center(img, c, (16, 24, 16))
        mz, my, mx = np.unravel_index(np.argmax(ref), ref.shape)
        assert pimg[mz, my, mx] == 1.0
        np.testing.assert_allclose(pimg, (ref - ref.min()) / (ref.max() - ref.min()))
