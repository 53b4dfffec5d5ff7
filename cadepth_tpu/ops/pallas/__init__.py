from cadepth_tpu.ops.pallas.fused_loss import (
    fused_depth_loss_stats,
    silog_reproj_losses,
)

__all__ = ["fused_depth_loss_stats", "silog_reproj_losses"]
