"""Run configuration (replaces the reference's in-source constants,
`/root/reference/ModeT/train.py:43-62`, with one dataclass + CLI).

Defaults reproduce the reference ModeT training run exactly: batch 1,
lr 1e-4 poly-0.9 per-epoch (rounded to 8 decimals), Adam(amsgrad),
NCC + L2-diffusion with weights [1, 1], 30 epochs, LPBA 160x192x160.
"""

from __future__ import annotations

import dataclasses
from typing import Sequence


@dataclasses.dataclass
class TrainConfig:
    model: str = "modet"
    train_dir: str = "/LPBA_path/Train/"
    val_dir: str = "/LPBA_path/Val/"
    batch_size: int = 1
    lr: float = 1e-4
    weights: Sequence[float] = (1.0, 1.0)
    head_dim: int = 6
    num_heads: Sequence[int] = (8, 4, 2, 1, 1)
    channels: int = 4
    qk_scale: float | None = 1.0  # reference trains ModeT with scale=1
    img_size: Sequence[int] = (160, 192, 160)
    max_epoch: int = 30
    epoch_start: int = 0
    cont_training: bool = False
    seed: int = 24
    save_root: str = "experiments"
    log_root: str = "logs"
    max_keep: int = 8
    num_workers: int = 4
    attn_impl: str = "auto"
    # "" = float32; "bfloat16" runs the feature path in bf16 (flow
    # composition stays f32; see models/modet.py)
    compute_dtype: str = ""
    # "auto": planes-layout decoder on TPU (single-chip); "planes": force;
    # "off": flax module
    fast_path: str = "auto"
    # dataset variant: "s2s" (all ordered pairs), "half" (stride-2
    # downsampled pairs), "atlas" (register every subject to one atlas)
    dataset: str = "s2s"
    atlas_path: str = ""
    # parallelism: number of data-parallel devices (1 = single chip)
    dp: int = 1
    # spatial (halo-exchange) parallelism: number of D-axis shards. > 1
    # trains the D-sharded PLANES graph (`parallel/modet_planes_sp.py`,
    # modet only); composes with dp over a (data, spatial) mesh
    spatial: int = 1
    # RCN: number of cascaded VTNs (`Baseline methods/RCN/train.py` trains 10)
    n_cascade: int = 10
    # RDN: outer stage recursion count and per-stage level recursion depths
    # (`Baseline methods/RDN/train.py:47-67`: stages=4, levels=[4,4,4,4])
    stages: int = 4
    levels: Sequence[int] = (4, 4, 4, 4)
    # RDN MC-dropout rate for the uncertainty protocol (0 = off)
    dropout_rate: float = 0.0

    @property
    def save_dir(self) -> str:
        """Reference save-dir naming convention (`ModeT/train.py:51`)."""
        if self.model == "modet":
            return "modet-heads({}{}{}{}{})-rpe_headim_{}_ncc_{}_reg_{}_lr_{}_54r/".format(
                *self.num_heads, self.head_dim, self.weights[0], self.weights[1], self.lr
            )
        return "{}_ncc_{}_reg_{}_lr_{}_54r/".format(
            self.model, self.weights[0], self.weights[1], self.lr
        )


@dataclasses.dataclass
class InferConfig:
    model: str = "modet"
    test_dir: str = "/LPBA_path/Test/"
    model_dir: str = ""
    model_idx: int = -1
    head_dim: int = 6
    num_heads: Sequence[int] = (8, 4, 2, 1, 1)
    channels: int = 4
    qk_scale: float | None = 1.0
    img_size: Sequence[int] = (160, 192, 160)
    attn_impl: str = "auto"
    compute_dtype: str = ""
    # "auto": planes-layout fast decoder for ModeT on TPU; "planes": force;
    # "off": always the flax module
    fast_path: str = "auto"
    dataset: str = "s2s"  # s2s | half | atlas
    atlas_path: str = ""
    # load a reference PyTorch .pth.tar instead of a native checkpoint
    torch_checkpoint: str = ""
    # structural knobs mirrored from TrainConfig (must match the checkpoint)
    n_cascade: int = 10
    stages: int = 4
    levels: Sequence[int] = (4, 4, 4, 4)
    dropout_rate: float = 0.0
    # MC-dropout uncertainty protocol (`RDN/utils.py:377-504`): mc_iter > 0
    # runs mc_iter stochastic forwards per pair (requires dropout_rate > 0)
    # and reports Gal-decomposed uncertainty + UCE instead of plain Dice
    mc_iter: int = 0


def apply_cli_overrides(cfg, argv: list[str]):
    """``key=value`` CLI overrides, e.g. ``train_dir=/data/Train lr=3e-4``."""
    for arg in argv:
        if "=" not in arg:
            raise SystemExit(f"expected key=value, got {arg!r}")
        key, val = arg.split("=", 1)
        if not hasattr(cfg, key):
            raise SystemExit(f"unknown config key {key!r}")
        cur = getattr(cfg, key)
        if isinstance(cur, bool):
            setattr(cfg, key, val.lower() in ("1", "true", "yes"))
        elif isinstance(cur, int):
            setattr(cfg, key, int(val))
        elif isinstance(cur, float) or cur is None:
            setattr(cfg, key, float(val) if val.lower() != "none" else None)
        elif isinstance(cur, str):
            setattr(cfg, key, val)
        else:  # sequence
            setattr(cfg, key, tuple(type(cur[0])(v) for v in val.split(",")))
    return cfg
