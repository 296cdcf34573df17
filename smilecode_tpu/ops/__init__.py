from smilecode_tpu.ops.warp import warp, base_grid
from smilecode_tpu.ops.integrate import vecint
from smilecode_tpu.ops.resize import (
    resize_flow,
    interp_trilinear,
    upsample2_trilinear,
    avg_pool2,
)

__all__ = [
    "warp",
    "base_grid",
    "vecint",
    "resize_flow",
    "interp_trilinear",
    "upsample2_trilinear",
    "avg_pool2",
]
