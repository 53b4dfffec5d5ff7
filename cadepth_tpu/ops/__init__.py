from cadepth_tpu.ops.resize import (
    resize_bilinear,
    resize_nearest,
    avg_pool2d,
    max_pool2d,
)
from cadepth_tpu.ops.grid_sample import (
    grid_sample,
    affine_grid,
)

__all__ = [
    "resize_bilinear",
    "resize_nearest",
    "avg_pool2d",
    "max_pool2d",
    "grid_sample",
    "affine_grid",
]
