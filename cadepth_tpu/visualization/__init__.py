from cadepth_tpu.visualization.depth_viz import (
    COLORMAPS,
    apply_colormap,
    create_error_map,
    create_comparison,
    create_depth_histogram,
    create_comparison_grid,
    save_depth_image,
)

__all__ = [
    "COLORMAPS",
    "apply_colormap",
    "create_error_map",
    "create_comparison",
    "create_depth_histogram",
    "create_comparison_grid",
    "save_depth_image",
]
