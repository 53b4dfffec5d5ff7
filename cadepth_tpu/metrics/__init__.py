from cadepth_tpu.metrics.depth_metrics import (
    METRIC_NAMES,
    compute_depth_metrics,
    compute_depth_metrics_per_sample,
    average_metrics,
    MetricsAccumulator,
    format_metrics,
)

__all__ = [
    "METRIC_NAMES",
    "compute_depth_metrics",
    "compute_depth_metrics_per_sample",
    "average_metrics",
    "MetricsAccumulator",
    "format_metrics",
]
