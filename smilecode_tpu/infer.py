"""Inference driver (`/root/reference/ModeT/infer.py:49-118` protocol).

Per ordered test pair: run the model, warp x_seg with the flow (nearest),
report Dice over 54 VOI labels (registered and raw/"affine"), and the
fraction of voxels with Jacobian determinant <= 0. Prints mean +- std.

Usage: python -m smilecode_tpu.infer test_dir=/data/Test model_dir=experiments/<run>
"""

from __future__ import annotations

import glob
import os
import sys

import jax
import jax.numpy as jnp
import numpy as np

from smilecode_tpu.config import InferConfig, apply_cli_overrides
from smilecode_tpu.data import (
    Compose,
    Loader,
    LPBABrainAtlasInferDataset,
    LPBABrainHalfInferDatasetS2S,
    LPBABrainInferDatasetS2S,
    NumpyType,
    Seg_norm,
)
from smilecode_tpu.metrics import dice_val_voi, fold_fraction
from smilecode_tpu.models.registry import build_model
from smilecode_tpu.ops.warp import warp
from smilecode_tpu.utils import AverageMeter
from smilecode_tpu.utils.checkpoint import latest_checkpoint, load_checkpoint


def make_infer_step(spec, cfg=None):
    """cfg.fast_path="planes" (or "auto" on TPU) routes ModeT through the
    planes-layout decoder (`models/modet_planes.py`) — same numerics, no
    NDHWC<->planes relayout churn."""
    fast = getattr(cfg, "fast_path", "auto") if cfg is not None else "off"
    model_name = getattr(cfg, "model", "") if cfg is not None else ""
    # attn_impl="xla" is an explicit opt-out of the Pallas kernels; honor it
    # by not auto-selecting the (Pallas-based) planes decoder (fast_path=
    # "planes" still forces it)
    forced_xla = getattr(cfg, "attn_impl", "auto") == "xla" if cfg is not None else False
    use_planes = model_name.startswith("modet") and (
        fast == "planes"
        or (fast == "auto" and not forced_xla and jax.default_backend() == "tpu")
    )
    if use_planes:
        from smilecode_tpu.models.modet_planes import modet_forward_planes

        def fwd(params, x, y):
            return modet_forward_planes(
                params, x, y,
                channels=cfg.channels, head_dim=cfg.head_dim,
                num_heads=tuple(cfg.num_heads), qk_scale=cfg.qk_scale,
                compute_dtype=getattr(cfg, "compute_dtype", "") or None,
            )
    else:
        def fwd(params, x, y):
            return spec.module.apply(params, x, y)

    @jax.jit
    def step(params, x, y, x_seg, y_seg):
        outs = fwd(params, x, y)
        flow = outs[1]
        def_seg = warp(x_seg.astype(jnp.float32), flow, mode="nearest").astype(jnp.int32)
        dice_trans = dice_val_voi(def_seg, y_seg.astype(jnp.int32))
        dice_raw = dice_val_voi(x_seg.astype(jnp.int32), y_seg.astype(jnp.int32))
        fold = fold_fraction(flow[0])
        return dice_trans, dice_raw, fold

    return step


def run_mc_uncertainty(spec, params, loader, cfg):
    """MC-dropout uncertainty protocol end-to-end
    (`/root/reference/Baseline methods/RDN/utils.py:377-504`):
    mc_iter stochastic forwards per pair -> Gal decomposition
    (`uncert_regression_gal`) -> calibration error (`uceloss`).

    The reference's gal decomposition expects an aleatoric variance head as
    the last output channel; our registration models emit a single moved-
    image channel, so with C == 1 the aleatoric term is zero and the
    uncertainty is the epistemic MC variance alone (documented deviation —
    the protocol, bins and UCE math are the reference's).
    """
    import jax

    from smilecode_tpu.metrics_ext import (
        get_mc_preds,
        uceloss,
        uncert_regression_gal,
    )
    from smilecode_tpu.utils import AverageMeter

    fwd = jax.jit(
        lambda p, m, f, key: spec.module.apply(p, m, f, rngs={"dropout": key})[:2]
    )

    def apply_fn(moving, fixed, key):
        return fwd(params, moving, fixed, key)

    meters = {k: AverageMeter() for k in ("ale", "epi", "uncert", "uce", "err")}
    rng = jax.random.PRNGKey(24)
    for i, batch in enumerate(loader):
        x, y = batch[0], batch[1]
        rng, sub = jax.random.split(rng)
        img_list, _ = get_mc_preds(apply_fn, x, y, mc_iter=cfg.mc_iter, rng=sub)
        preds = np.stack(img_list, axis=0)  # (N, B, D, H, W, C)
        if preds.shape[-1] > 1:
            ale, epi, uncert = uncert_regression_gal(img_list, reduction=None)
            pred_mean = preds[..., :-1].mean(axis=0)
        else:
            ale = np.zeros_like(preds[0])
            epi = preds.var(axis=0, ddof=1).mean(axis=-1, keepdims=True)
            uncert = ale + epi
            pred_mean = preds.mean(axis=0)
        err = ((pred_mean[..., : uncert.shape[-1]] - np.asarray(y)) ** 2)
        uce, _, _, _ = uceloss(err, uncert)
        meters["ale"].update(float(np.mean(ale)))
        meters["epi"].update(float(np.mean(epi)))
        meters["uncert"].update(float(np.mean(uncert)))
        meters["err"].update(float(np.mean(err)))
        meters["uce"].update(uce)
        print(
            "pair {}: ale {:.6f}, epi {:.6f}, uncert {:.6f}, err {:.6f}, UCE {:.6f}".format(
                i, float(np.mean(ale)), float(np.mean(epi)),
                float(np.mean(uncert)), float(np.mean(err)), uce
            )
        )
    print(
        "MC uncertainty ({} samples): ale {:.6f} +- {:.6f}, epi {:.6f} +- {:.6f}, "
        "UCE {:.6f} +- {:.6f}".format(
            cfg.mc_iter, meters["ale"].avg, meters["ale"].std,
            meters["epi"].avg, meters["epi"].std,
            meters["uce"].avg, meters["uce"].std,
        )
    )
    return meters["uce"].avg, meters["epi"].avg


def main(cfg: InferConfig):
    spec = build_model(cfg.model, cfg)
    if cfg.torch_checkpoint:
        from smilecode_tpu.convert import load_torch_checkpoint, renames_for

        params = load_torch_checkpoint(
            cfg.torch_checkpoint, spec.module, img_size=tuple(cfg.img_size),
            renames=renames_for(cfg.model),
        )
        params = jax.tree.map(jnp.asarray, params)
        print(f"loaded torch checkpoint {cfg.torch_checkpoint}")
    else:
        ckpt_path = latest_checkpoint(cfg.model_dir, cfg.model_idx)
        if ckpt_path is None:
            raise SystemExit(f"no checkpoints in {cfg.model_dir!r}")
        state = load_checkpoint(ckpt_path)
        params = jax.tree.map(jnp.asarray, state["params"])
        print(f"loaded {ckpt_path} (epoch {state.get('epoch')}, best_dsc {state.get('best_dsc')})")

    test_composed = Compose([Seg_norm(), NumpyType((np.float32, np.int16))])
    test_paths = sorted(glob.glob(os.path.join(cfg.test_dir, "*.pkl")))
    if cfg.dataset == "half":
        test_set = LPBABrainHalfInferDatasetS2S(test_paths, transforms=test_composed)
    elif cfg.dataset == "atlas":
        test_set = LPBABrainAtlasInferDataset(test_paths, cfg.atlas_path, transforms=test_composed)
    else:
        test_set = LPBABrainInferDatasetS2S(test_paths, transforms=test_composed)
    loader = Loader(test_set, batch_size=1, shuffle=False)
    if cfg.mc_iter > 0:
        if cfg.dropout_rate <= 0:
            raise SystemExit("mc_iter > 0 requires dropout_rate > 0 "
                             "(a deterministic net has zero MC variance)")
        return run_mc_uncertainty(spec, params, loader, cfg)
    step = make_infer_step(spec, cfg)

    eval_dsc_def = AverageMeter()
    eval_dsc_raw = AverageMeter()
    eval_det = AverageMeter()
    for x, y, x_seg, y_seg in loader:
        dice_trans, dice_raw, fold = step(params, x, y, x_seg, y_seg)
        eval_dsc_def.update(float(dice_trans), x.shape[0])
        eval_dsc_raw.update(float(dice_raw), x.shape[0])
        eval_det.update(float(fold), x.shape[0])
        print(
            "Trans dsc: {:.4f}, Raw dsc: {:.4f}, fold: {:.6f}".format(
                float(dice_trans), float(dice_raw), float(fold)
            )
        )
    print("Deformed DSC: {:.3f} +- {:.3f}, Affine DSC: {:.3f} +- {:.3f}".format(
        eval_dsc_def.avg, eval_dsc_def.std, eval_dsc_raw.avg, eval_dsc_raw.std
    ))
    print("deformed det: {:.4f}, std: {:.4f}".format(eval_det.avg, eval_det.std))
    return eval_dsc_def.avg, eval_det.avg


if __name__ == "__main__":
    main(apply_cli_overrides(InferConfig(), sys.argv[1:]))
