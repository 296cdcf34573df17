from smilecode_tpu.losses.core import ncc_vxm, grad3d

__all__ = ["ncc_vxm", "grad3d"]
