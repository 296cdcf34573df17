"""End-to-end driver test: train 1 epoch on synthetic pkl data, then infer.

Exercises the full reference protocol on tiny volumes: pkl datasets ->
loader -> jitted train step -> validation Dice -> rolling checkpoint ->
inference metrics.
"""

import os
import pickle

import numpy as np
import pytest

from smilecode_tpu.data.trans import LPBA_SEG_TABLE

pytestmark = pytest.mark.slow  # 1-epoch train + infer drivers

SHAPE = (16, 16, 16)  # divisible by 16


@pytest.fixture(scope="module")
def data_dirs(tmp_path_factory):
    rng = np.random.default_rng(0)
    root = tmp_path_factory.mktemp("lpba_e2e")
    for split, n in [("Train", 3), ("Val", 2), ("Test", 2)]:
        d = root / split
        d.mkdir()
        for i in range(n):
            img = rng.random(SHAPE).astype(np.float32)
            seg = rng.choice(LPBA_SEG_TABLE[:8], SHAPE).astype(np.uint16)
            with open(d / f"subject_{i:02d}.pkl", "wb") as f:
                pickle.dump((img, seg), f)
    return root


def test_train_then_infer(data_dirs, tmp_path):
    from smilecode_tpu.config import TrainConfig, InferConfig
    from smilecode_tpu import train as train_mod
    from smilecode_tpu import infer as infer_mod
    import sys

    cfg = TrainConfig(
        train_dir=str(data_dirs / "Train"),
        val_dir=str(data_dirs / "Val"),
        img_size=SHAPE,
        max_epoch=1,
        num_workers=0,
        save_root=str(tmp_path / "experiments"),
        log_root=str(tmp_path / "logs"),
    )
    real_stdout = sys.stdout
    try:
        best = train_mod.main(cfg)
    finally:
        sys.stdout = real_stdout
    assert 0.0 <= best <= 1.0

    exp_dir = os.path.join(cfg.save_root, cfg.save_dir)
    ckpts = [f for f in os.listdir(exp_dir) if f.endswith(".ckpt")]
    assert len(ckpts) == 1, ckpts
    log_dir = os.path.join(cfg.log_root, cfg.save_dir)
    assert os.path.exists(os.path.join(log_dir, "logfile.log"))
    assert os.path.exists(os.path.join(log_dir, "metrics.jsonl"))
    assert os.path.exists(os.path.join(log_dir, "losses and dice.txt"))

    icfg = InferConfig(
        test_dir=str(data_dirs / "Test"),
        model_dir=exp_dir,
        img_size=SHAPE,
    )
    dsc, fold = infer_mod.main(icfg)
    assert 0.0 <= dsc <= 1.0
    assert 0.0 <= fold <= 1.0
