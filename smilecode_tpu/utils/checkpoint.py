"""Checkpointing: pickled numpy pytrees with the reference's rolling policy.

Mirrors `save_checkpoint` (`/root/reference/ModeT/train.py:171-176`): files
named by validation Dice (``dsc{:.3f}.ckpt``), natural-sorted, keep at most 8
(delete lowest-sorted first). Resume loads the natsorted-last file
(`/root/reference/ModeT/train.py:83-84`).
"""

from __future__ import annotations

import glob
import os
import pickle
import re

import jax
import numpy as np


def _natsort_key(s: str):
    return [int(t) if t.isdigit() else t for t in re.split(r"(\d+)", os.path.basename(s))]


def _to_numpy(tree):
    return jax.tree.map(lambda x: np.asarray(x), tree)


def save_checkpoint(state: dict, save_dir: str, filename: str, max_keep: int = 8):
    """Pickle ``state`` (pytree values converted to numpy) with rolling keep."""
    os.makedirs(save_dir, exist_ok=True)
    path = os.path.join(save_dir, filename)
    with open(path, "wb") as f:
        pickle.dump(_to_numpy(state), f)
    ckpts = sorted(glob.glob(os.path.join(save_dir, "*.ckpt")), key=_natsort_key)
    while len(ckpts) > max_keep:
        os.remove(ckpts[0])
        ckpts = sorted(glob.glob(os.path.join(save_dir, "*.ckpt")), key=_natsort_key)
    return path


def latest_checkpoint(save_dir: str, idx: int = -1) -> str | None:
    ckpts = sorted(glob.glob(os.path.join(save_dir, "*.ckpt")), key=_natsort_key)
    return ckpts[idx] if ckpts else None


def load_checkpoint(path: str) -> dict:
    with open(path, "rb") as f:
        return pickle.load(f)
