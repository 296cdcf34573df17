"""smilecode_tpu — TPU-native rebuild of the Smile Lab registration stack.

A JAX/XLA/Pallas re-design (not a port) of ZAX130/SmileCode: unsupervised
deformable 3D medical image registration (ModeT + baselines Im2Grid, PCNet,
PRNet/PRNet++, VTN/RCN, RDN) for brain MRI.

Layout convention: all volumes are channels-last ``(B, D, H, W, C)`` (NDHWC —
the TPU-friendly layout); deformation fields are ``(B, D, H, W, 3)`` with the
last axis ordered ``(dd, dh, dw)`` — displacement in voxels along each spatial
axis, matching the reference's channels-first dim order
(``/root/reference/ModeT/models.py:49-67``) transposed to channels-last.
"""

__version__ = "0.1.0"

from smilecode_tpu.ops.warp import warp, base_grid
from smilecode_tpu.ops.integrate import vecint
from smilecode_tpu.ops.resize import resize_flow, interp_trilinear, upsample2_trilinear

__all__ = [
    "warp",
    "base_grid",
    "vecint",
    "resize_flow",
    "interp_trilinear",
    "upsample2_trilinear",
]
