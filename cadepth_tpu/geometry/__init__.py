from cadepth_tpu.geometry.rays import (
    ray_grid,
    ray_grid_batch,
    rays_to_world,
    ray_depth,
)
from cadepth_tpu.geometry.intrinsics import (
    k4_from_matrix,
    matrix_from_k4,
    normalize_k4,
    rescale_intrinsics,
    crop_intrinsics,
    hflip_intrinsics,
    invert_intrinsics,
)
from cadepth_tpu.geometry.io import (
    save_ray_directions,
    load_ray_directions,
    load_intrinsics_txt,
    load_pose_txt,
)

__all__ = [
    "ray_grid",
    "ray_grid_batch",
    "rays_to_world",
    "ray_depth",
    "k4_from_matrix",
    "matrix_from_k4",
    "normalize_k4",
    "rescale_intrinsics",
    "crop_intrinsics",
    "hflip_intrinsics",
    "invert_intrinsics",
    "save_ray_directions",
    "load_ray_directions",
    "load_intrinsics_txt",
    "load_pose_txt",
]
