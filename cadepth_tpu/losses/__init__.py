from cadepth_tpu.losses.depth_loss import (
    scale_invariant_loss,
    gradient_matching_loss,
    smoothness_loss,
    reprojection_loss,
    CombinedDepthLoss,
)

__all__ = [
    "scale_invariant_loss",
    "gradient_matching_loss",
    "smoothness_loss",
    "reprojection_loss",
    "CombinedDepthLoss",
]
