from smilecode_tpu.losses.core import ncc_vxm, grad3d
from smilecode_tpu.losses.extended import (
    ssim2d,
    ssim3d,
    ssim3d_loss,
    grad2d,
    grad3d_itv,
    displacement_regularizer,
    mind_ssc,
    mind_loss,
    mutual_information,
    local_mutual_information,
)

__all__ = [
    "ncc_vxm", "grad3d", "ssim2d", "ssim3d", "ssim3d_loss", "grad2d",
    "grad3d_itv", "displacement_regularizer", "mind_ssc", "mind_loss",
    "mutual_information", "local_mutual_information",
]
