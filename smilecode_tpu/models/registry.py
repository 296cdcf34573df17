"""Model registry: name -> (module factory, training loss plan).

The reference's 7 train.py clones differ only in model construction and in
how model outputs map to criterions (SURVEY.md section 0/3.1); that mapping
lives here once.

A loss *plan* is a list of (criterion_name, weight_index) applied index-wise
to the model's (possibly sliced) training outputs against the fixed volume,
exactly like `loss = sum criterions[n](output[n], y) * weights[n]`
(`/root/reference/ModeT/train.py:126-129`).
"""

from __future__ import annotations

from typing import Callable

from smilecode_tpu.losses import ncc_vxm, grad3d


def _ncc(pred, fixed):
    return ncc_vxm(pred, fixed)


def _grad_l2(pred, fixed):
    return grad3d(pred, penalty="l2")


CRITERIA = {"ncc": _ncc, "grad_l2": _grad_l2}


class ModelSpec:
    def __init__(self, module, criterions, select_train_outputs=None, fast_forward=None):
        self.module = module
        self.criterions = criterions  # list of criterion names, index-aligned
        # optional reordering/slicing of model outputs before loss application
        # (e.g. RCN drops the composed flow: output[0:1] + output[2:])
        self.select_train_outputs = select_train_outputs or (lambda outs: outs)
        # optional layout-optimized forward (params, moving, fixed) -> outputs
        # equal to module.apply (ModeT: the planes-layout decoder)
        self.fast_forward = fast_forward


def build_model(name: str, cfg) -> ModelSpec:
    name = name.lower()
    if name in ("modet", "modet-cu", "modet_cu", "modetcu"):
        from smilecode_tpu.models.modet import ModeT

        # "modet-cu" = the reference's fused-CUDA-operator variant; here the
        # fused Pallas kernel plays that role (forced rather than auto)
        attn_impl = "pallas" if name != "modet" else cfg.attn_impl
        module = ModeT(
            channels=cfg.channels,
            head_dim=cfg.head_dim,
            num_heads=tuple(cfg.num_heads),
            qk_scale=cfg.qk_scale,
            attn_impl=attn_impl,
            compute_dtype=getattr(cfg, "compute_dtype", "") or None,
        )

        def fast_forward(params, moving, fixed):
            from smilecode_tpu.models.modet_planes import modet_forward_planes

            return modet_forward_planes(
                params, moving, fixed,
                channels=cfg.channels, head_dim=cfg.head_dim,
                num_heads=tuple(cfg.num_heads), qk_scale=cfg.qk_scale,
                compute_dtype=getattr(cfg, "compute_dtype", "") or None,
            )

        return ModelSpec(module, ["ncc", "grad_l2"], fast_forward=fast_forward)
    if name == "im2grid":
        from smilecode_tpu.models.im2grid import Im2grid

        return ModelSpec(Im2grid(), ["ncc", "grad_l2"])
    if name == "pcnet":
        from smilecode_tpu.models.pcnet import PCNet

        return ModelSpec(PCNet(), ["ncc", "grad_l2"])
    if name == "prnet":
        from smilecode_tpu.models.prnet import PRNet

        return ModelSpec(PRNet(), ["ncc", "grad_l2"])
    if name in ("prnetplusplus", "prnet++", "prpp"):
        from smilecode_tpu.models.prnet import PRNetPlusPlus

        return ModelSpec(PRNetPlusPlus(), ["ncc", "grad_l2"])
    if name == "vtn":
        from smilecode_tpu.models.rcn import VTN

        return ModelSpec(VTN(), ["ncc", "grad_l2"])
    if name == "rcn":
        from smilecode_tpu.models.rcn import RCN

        n_cascade = getattr(cfg, "n_cascade", 10)
        # reference RCN train: output[0:1] + output[2:] (drop composed flow),
        # NCC on moved + Grad3d on each of the cascade subflows
        return ModelSpec(
            RCN(n_cascade=n_cascade),
            ["ncc"] + ["grad_l2"] * n_cascade,
            select_train_outputs=lambda outs: outs[0:1] + outs[2:],
        )
    if name.startswith("rdn"):
        from smilecode_tpu.models.rdn import RDN

        # reference train config: stages=4, levels=[4,4,4,4]
        # (`Baseline methods/RDN/train.py:47-67,105-106`)
        stages = getattr(cfg, "stages", 4)
        levels = tuple(getattr(cfg, "levels", (4, 4, 4, 4)))
        return ModelSpec(
            RDN(
                stages=stages,
                levels=levels,
                share_weights="share" in name,
                diff="diff" in name,
                dropout_rate=getattr(cfg, "dropout_rate", 0.0),
            ),
            ["ncc"] + ["grad_l2"] * stages,
            select_train_outputs=lambda outs: outs[0:1] + outs[2:],
        )
    raise ValueError(f"unknown model {name!r}")
