"""LPBA pair datasets (torch-free; yields numpy arrays, channels-last ready).

Parity with `/root/reference/ModeT/data/datasets.py:12-177` (all-ordered-pairs
S2S datasets + stride-2 Half variants) and the atlas-mode datasets of RDN
(`/root/reference/Baseline methods/RDN/data/datasets.py:10-82`).

Pair index math (reference lines 24-27):
    x = i // (n-1); s = i % (n-1); y = s + 1 if s >= x else s
which enumerates all n*(n-1) ordered (x, y) pairs with x != y.

Items are numpy arrays shaped (1, D, H, W) (leading channel axis, as the
reference's transforms expect); the Loader converts to NDHWC device arrays.
"""

from __future__ import annotations

import pickle

import numpy as np


def pkload(fname):
    with open(fname, "rb") as f:
        return pickle.load(f)


def pair_indices(index: int, n: int) -> tuple[int, int]:
    x = index // (n - 1)
    s = index % (n - 1)
    y = s + 1 if s >= x else s
    return x, y


class _PairDataset:
    """Base: all ordered pairs over a list of pkl subject paths."""

    def __init__(self, data_path, transforms, half=False):
        self.paths = list(data_path)
        self.transforms = transforms
        self.half = half

    def __len__(self):
        return len(self.paths) * (len(self.paths) - 1)

    def _load(self, path):
        img, seg = pkload(path)
        if self.half:
            from smilecode_tpu import native

            img, seg = native.halfres(img), native.halfres(seg)
        return img, seg


class LPBABrainDatasetS2S(_PairDataset):
    """Training pairs: (x, y) images only, transformed jointly."""

    def __getitem__(self, index):
        xi, yi = pair_indices(index, len(self.paths))
        x, _ = self._load(self.paths[xi])
        y, _ = self._load(self.paths[yi])
        x, y = x[None, ...], y[None, ...]
        x, y = self.transforms([x, y])
        return np.ascontiguousarray(x), np.ascontiguousarray(y)


class LPBABrainInferDatasetS2S(_PairDataset):
    """Eval pairs: (x, y, x_seg, y_seg); transform applied per (img, seg)."""

    def __getitem__(self, index):
        xi, yi = pair_indices(index, len(self.paths))
        x, x_seg = self._load(self.paths[xi])
        y, y_seg = self._load(self.paths[yi])
        x, y = x[None, ...], y[None, ...]
        x_seg, y_seg = x_seg[None, ...], y_seg[None, ...]
        x, x_seg = self.transforms([x, x_seg])
        y, y_seg = self.transforms([y, y_seg])
        return (
            np.ascontiguousarray(x),
            np.ascontiguousarray(y),
            np.ascontiguousarray(x_seg),
            np.ascontiguousarray(y_seg),
        )


class LPBABrainHalfDatasetS2S(LPBABrainDatasetS2S):
    def __init__(self, data_path, transforms):
        super().__init__(data_path, transforms, half=True)


class LPBABrainHalfInferDatasetS2S(LPBABrainInferDatasetS2S):
    def __init__(self, data_path, transforms):
        super().__init__(data_path, transforms, half=True)


class LPBABrainAtlasDataset(_PairDataset):
    """Atlas mode: register every subject to one fixed atlas volume
    (`/root/reference/Baseline methods/RDN/data/datasets.py:10-52`)."""

    def __init__(self, data_path, atlas_path, transforms):
        super().__init__(data_path, transforms)
        self.atlas_path = atlas_path

    def __len__(self):
        return len(self.paths)

    def __getitem__(self, index):
        x, _ = self._load(self.paths[index])
        y, _ = pkload(self.atlas_path)
        x, y = x[None, ...], y[None, ...]
        x, y = self.transforms([x, y])
        return np.ascontiguousarray(x), np.ascontiguousarray(y)


class LPBABrainAtlasInferDataset(_PairDataset):
    def __init__(self, data_path, atlas_path, transforms):
        super().__init__(data_path, transforms)
        self.atlas_path = atlas_path

    def __len__(self):
        return len(self.paths)

    def __getitem__(self, index):
        x, x_seg = self._load(self.paths[index])
        y, y_seg = pkload(self.atlas_path)
        x, y = x[None, ...], y[None, ...]
        x_seg, y_seg = x_seg[None, ...], y_seg[None, ...]
        x, x_seg = self.transforms([x, x_seg])
        y, y_seg = self.transforms([y, y_seg])
        return (
            np.ascontiguousarray(x),
            np.ascontiguousarray(y),
            np.ascontiguousarray(x_seg),
            np.ascontiguousarray(y_seg),
        )
