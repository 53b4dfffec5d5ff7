"""Standard monocular depth metrics as jittable, vmappable functions.

Parity target: `src/evaluation/depth_metrics.h`. The 9 metrics plus the
three auxiliary values (`num_valid_pixels`, `mean_pred_depth`,
`mean_gt_depth`) are returned from one fixed-shape masked reduction —
the reference's `masked_select` flattening (`depth_metrics.h:57-58`)
becomes ``where``-sums so the whole suite runs on device inside the
validation step, not on host.

Mask rule (`depth_metrics.h:147-164`): gt in (min_depth, max_depth),
strict inequalities, AND'ed with an optional user mask. Predictions are
clamped to [min_depth, max_depth] before metric math
(`depth_metrics.h:66`); gt is used unclamped.
"""

from __future__ import annotations

from typing import Dict, List, Optional

import jax
import jax.numpy as jnp

METRIC_NAMES = (
    "abs_rel",
    "sq_rel",
    "rmse",
    "rmse_log",
    "mae",
    "log10",
    "delta_1.25",
    "delta_1.25^2",
    "delta_1.25^3",
    "num_valid_pixels",
    "mean_pred_depth",
    "mean_gt_depth",
)


def compute_depth_metrics(
    pred: jax.Array,
    gt: jax.Array,
    valid_mask: Optional[jax.Array] = None,
    min_depth: float = 0.1,
    max_depth: float = 10.0,
) -> Dict[str, jax.Array]:
    """All depth metrics over the valid pixels of a (possibly batched) map.

    Parity with `DepthMetrics::compute` (`depth_metrics.h:40-88`).
    Accepts any leading shape; reduces over everything. Returns a dict
    of fp32 scalars; all-zero when no pixel is valid
    (`depth_metrics.h:61-62, 238-253`).
    """
    pred = pred.astype(jnp.float32)
    gt = gt.astype(jnp.float32)
    mask = (gt > min_depth) & (gt < max_depth)
    if valid_mask is not None:
        mask = mask & valid_mask.astype(bool)
    maskf = mask.astype(jnp.float32)
    n = jnp.sum(maskf)
    n_safe = jnp.maximum(n, 1.0)

    p = jnp.clip(pred, min_depth, max_depth)
    g = gt

    def mmean(x: jax.Array) -> jax.Array:
        return jnp.sum(x * maskf) / n_safe

    # Guard logs/ratios against gt<=0 outside the mask (contributions are
    # zeroed by maskf, but NaN*0 = NaN, so substitute a safe value first).
    g_safe = jnp.where(mask, g, 1.0)
    p_safe = jnp.where(mask, p, 1.0)

    diff = p_safe - g_safe
    abs_diff = jnp.abs(diff)
    log_diff = jnp.log(p_safe) - jnp.log(g_safe)
    ratio = jnp.maximum(p_safe / g_safe, g_safe / p_safe)

    metrics = {
        "abs_rel": mmean(abs_diff / g_safe),
        "sq_rel": mmean(diff * diff / g_safe),
        "rmse": jnp.sqrt(mmean(diff * diff)),
        "rmse_log": jnp.sqrt(mmean(log_diff * log_diff)),
        "mae": mmean(abs_diff),
        "log10": mmean(jnp.abs(log_diff) / jnp.log(10.0)),
        "delta_1.25": mmean((ratio < 1.25).astype(jnp.float32)),
        "delta_1.25^2": mmean((ratio < 1.25 ** 2).astype(jnp.float32)),
        "delta_1.25^3": mmean((ratio < 1.25 ** 3).astype(jnp.float32)),
        "num_valid_pixels": n,
        "mean_pred_depth": mmean(p_safe),
        "mean_gt_depth": mmean(g_safe),
    }
    has_valid = n > 0
    return {k: jnp.where(has_valid, v, 0.0) for k, v in metrics.items()}


def compute_depth_metrics_per_sample(
    pred: jax.Array,
    gt: jax.Array,
    valid_mask: Optional[jax.Array] = None,
    min_depth: float = 0.1,
    max_depth: float = 10.0,
) -> Dict[str, jax.Array]:
    """Per-sample metrics over a batch — vmapped, one launch for the batch.

    Parity with `DepthMetrics::computePerSample` (`depth_metrics.h:93-117`)
    but without the reference's per-sample host loop. Returns a dict of
    (B,) arrays.
    """
    def single(p, g, m):
        return compute_depth_metrics(p, g, m, min_depth, max_depth)

    if valid_mask is None:
        return jax.vmap(lambda p, g: single(p, g, None))(pred, gt)
    return jax.vmap(single)(pred, gt, valid_mask)


def average_metrics(metrics_list: List[Dict[str, float]]) -> Dict[str, float]:
    """Arithmetic mean of a list of metric dicts (host-side).

    Parity with `DepthMetrics::average` (`depth_metrics.h:122-141`).
    """
    if not metrics_list:
        return {k: 0.0 for k in METRIC_NAMES}
    out: Dict[str, float] = {}
    for key in metrics_list[0]:
        out[key] = float(sum(float(m[key]) for m in metrics_list) / len(metrics_list))
    return out


class MetricsAccumulator:
    """Running-mean accumulator over batches.

    Parity with `MetricsAccumulator` (`depth_metrics.h:259-304`).
    """

    def __init__(self) -> None:
        self._sums: Dict[str, float] = {}
        self._count = 0

    def update(self, metrics: Dict[str, float]) -> None:
        for key, value in metrics.items():
            self._sums[key] = self._sums.get(key, 0.0) + float(value)
        self._count += 1

    def average(self) -> Dict[str, float]:
        if self._count == 0:
            return {}
        return {k: v / self._count for k, v in self._sums.items()}

    def reset(self) -> None:
        self._sums.clear()
        self._count = 0

    @property
    def count(self) -> int:
        return self._count


def format_metrics(metrics: Dict[str, float]) -> str:
    """Pretty-print a metric dict (parity with `formatMetrics`, `depth_metrics.h:309-333`)."""
    lines = [
        "Error Metrics:",
        f"  AbsRel:  {float(metrics['abs_rel']):.4f}",
        f"  RMSE:    {float(metrics['rmse']):.4f}",
        f"  RMSElog: {float(metrics['rmse_log']):.4f}",
        f"  MAE:     {float(metrics['mae']):.4f}",
        "",
        "Accuracy Metrics (%):",
        f"  delta < 1.25:    {float(metrics['delta_1.25']) * 100.0:.4f}%",
        f"  delta < 1.25^2:  {float(metrics['delta_1.25^2']) * 100.0:.4f}%",
        f"  delta < 1.25^3:  {float(metrics['delta_1.25^3']) * 100.0:.4f}%",
        "",
        "Statistics:",
        f"  Valid pixels: {int(metrics['num_valid_pixels'])}",
        f"  Mean pred:    {float(metrics['mean_pred_depth']):.4f}m",
        f"  Mean GT:      {float(metrics['mean_gt_depth']):.4f}m",
    ]
    return "\n".join(lines)
