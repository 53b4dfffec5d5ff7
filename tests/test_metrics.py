"""Metric numerics vs. direct numpy ports of depth_metrics.h formulas."""

import numpy as np
import jax.numpy as jnp
import pytest

from cadepth_tpu.metrics import (
    METRIC_NAMES,
    compute_depth_metrics,
    compute_depth_metrics_per_sample,
    average_metrics,
    MetricsAccumulator,
    format_metrics,
)

MIN_D, MAX_D = 0.1, 10.0


def np_metrics(pred, gt, min_d=MIN_D, max_d=MAX_D):
    """Direct port of DepthMetrics::compute (depth_metrics.h:40-88)."""
    mask = (gt > min_d) & (gt < max_d)
    p = np.clip(pred[mask], min_d, max_d)
    g = gt[mask]
    if p.size == 0:
        return {k: 0.0 for k in METRIC_NAMES}
    ratio = np.maximum(p / g, g / p)
    return {
        "abs_rel": float((np.abs(p - g) / g).mean()),
        "sq_rel": float(((p - g) ** 2 / g).mean()),
        "rmse": float(np.sqrt(((p - g) ** 2).mean())),
        "rmse_log": float(np.sqrt(((np.log(p) - np.log(g)) ** 2).mean())),
        "mae": float(np.abs(p - g).mean()),
        "log10": float(np.abs(np.log10(p) - np.log10(g)).mean()),
        "delta_1.25": float((ratio < 1.25).mean()),
        "delta_1.25^2": float((ratio < 1.25 ** 2).mean()),
        "delta_1.25^3": float((ratio < 1.25 ** 3).mean()),
        "num_valid_pixels": float(p.size),
        "mean_pred_depth": float(p.mean()),
        "mean_gt_depth": float(g.mean()),
    }


def test_metrics_parity(rng):
    pred = rng.uniform(0.0, 12.0, size=(2, 20, 30, 1)).astype(np.float32)
    gt = rng.uniform(0.0, 12.0, size=(2, 20, 30, 1)).astype(np.float32)
    got = compute_depth_metrics(jnp.asarray(pred), jnp.asarray(gt))
    want = np_metrics(pred, gt)
    for k in METRIC_NAMES:
        assert float(got[k]) == pytest.approx(want[k], rel=2e-5, abs=1e-6), k


def test_metrics_perfect_prediction(rng):
    gt = rng.uniform(0.5, 9.0, size=(1, 16, 16, 1)).astype(np.float32)
    got = compute_depth_metrics(jnp.asarray(gt), jnp.asarray(gt))
    assert float(got["abs_rel"]) == pytest.approx(0.0, abs=1e-6)
    assert float(got["rmse"]) == pytest.approx(0.0, abs=1e-5)
    assert float(got["delta_1.25"]) == pytest.approx(1.0)


def test_metrics_empty_mask():
    z = jnp.zeros((1, 8, 8, 1))
    got = compute_depth_metrics(z, z)
    for k in METRIC_NAMES:
        assert float(got[k]) == 0.0


def test_metrics_user_mask(rng):
    pred = rng.uniform(0.5, 9.0, size=(1, 10, 10, 1)).astype(np.float32)
    gt = rng.uniform(0.5, 9.0, size=(1, 10, 10, 1)).astype(np.float32)
    user = np.zeros_like(gt, dtype=bool)
    user[:, :5] = True
    got = compute_depth_metrics(jnp.asarray(pred), jnp.asarray(gt), jnp.asarray(user))
    want = np_metrics(np.where(user, pred, 0), np.where(user, gt, 0))
    assert float(got["num_valid_pixels"]) == want["num_valid_pixels"]
    assert float(got["abs_rel"]) == pytest.approx(want["abs_rel"], rel=1e-5)


def test_per_sample_metrics(rng):
    pred = rng.uniform(0.5, 9.0, size=(3, 12, 12, 1)).astype(np.float32)
    gt = rng.uniform(0.5, 9.0, size=(3, 12, 12, 1)).astype(np.float32)
    got = compute_depth_metrics_per_sample(jnp.asarray(pred), jnp.asarray(gt))
    assert got["abs_rel"].shape == (3,)
    for i in range(3):
        want = np_metrics(pred[i : i + 1], gt[i : i + 1])
        assert float(got["abs_rel"][i]) == pytest.approx(want["abs_rel"], rel=1e-5)


def test_accumulator_and_average():
    acc = MetricsAccumulator()
    acc.update({"abs_rel": 0.2})
    acc.update({"abs_rel": 0.4})
    assert acc.average()["abs_rel"] == pytest.approx(0.3)
    assert acc.count == 2
    avg = average_metrics([{"abs_rel": 0.1}, {"abs_rel": 0.3}])
    assert avg["abs_rel"] == pytest.approx(0.2)
    assert average_metrics([])["abs_rel"] == 0.0


def test_format_metrics_runs(rng):
    gt = rng.uniform(0.5, 9.0, size=(1, 8, 8, 1)).astype(np.float32)
    m = {k: float(v) for k, v in compute_depth_metrics(jnp.asarray(gt), jnp.asarray(gt)).items()}
    text = format_metrics(m)
    assert "AbsRel" in text and "Valid pixels" in text
