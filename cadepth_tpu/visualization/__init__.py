from cadepth_tpu.visualization.depth_viz import (
    COLORMAPS,
    apply_colormap,
    create_error_map,
    create_comparison,
    create_depth_histogram,
    create_comparison_grid,
    save_depth_image,
    add_label,
    create_labeled_comparison,
    create_histogram,
    create_metrics_panel,
    create_comprehensive_visualization,
)

__all__ = [
    "COLORMAPS",
    "apply_colormap",
    "create_error_map",
    "create_comparison",
    "create_depth_histogram",
    "create_comparison_grid",
    "save_depth_image",
    "add_label",
    "create_labeled_comparison",
    "create_histogram",
    "create_metrics_panel",
    "create_comprehensive_visualization",
]
