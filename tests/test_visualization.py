"""Visualization + TensorBoard logger tests."""

import numpy as np
import pytest

from cadepth_tpu.visualization import (
    COLORMAPS,
    apply_colormap,
    create_error_map,
    create_comparison,
    create_depth_histogram,
    create_comparison_grid,
    save_depth_image,
)
from cadepth_tpu.training.tb_logger import TensorBoardLogger, _FileFallbackWriter


def test_apply_colormap_all_maps(rng):
    depth = rng.uniform(0, 10, size=(24, 32, 1)).astype(np.float32)
    for cmap in COLORMAPS:
        out = apply_colormap(depth, cmap)
        assert out.shape == (24, 32, 3)
        assert out.dtype == np.uint8
    with pytest.raises(ValueError):
        apply_colormap(depth, "nope")


def test_apply_colormap_fixed_range(rng):
    depth = np.full((8, 8), 5.0, np.float32)
    # fixed range: constant 5m in [0, 10] maps mid-scale, not min/max-normalized
    out_fixed = apply_colormap(depth, "viridis", min_depth=0.0, max_depth=10.0)
    out_auto = apply_colormap(depth, "viridis")
    assert not np.array_equal(out_fixed, out_auto)


def test_error_map_zero_for_perfect(rng):
    d = rng.uniform(1, 9, size=(16, 16, 1)).astype(np.float32)
    err = create_error_map(d, d)
    # zero error -> uniform color (the colormap's zero bin)
    assert (err == err[0, 0]).all()


def test_comparison_strip(rng):
    rgb = rng.uniform(0, 1, size=(16, 20, 3)).astype(np.float32)
    gt = rng.uniform(0, 10, size=(16, 20, 1)).astype(np.float32)
    pred = rng.uniform(0, 10, size=(16, 20, 1)).astype(np.float32)
    strip = create_comparison(rgb, gt, pred)
    assert strip.shape == (16, 80, 3)  # 4 panels wide


def test_depth_histogram(rng):
    d = rng.uniform(0.5, 9.5, size=(100,)).astype(np.float32)
    img = create_depth_histogram(d)
    assert img.shape == (200, 400, 3)
    assert (img != 255).any()  # bars drawn
    empty = create_depth_histogram(np.zeros(10))
    assert (empty == 255).all()


def test_comparison_grid(rng):
    rgbs = [rng.uniform(0, 1, size=(8, 10, 3)).astype(np.float32)] * 3
    gts = [rng.uniform(0, 10, size=(8, 10, 1)).astype(np.float32)] * 3
    preds = gts
    grid = create_comparison_grid(rgbs, gts, preds)
    assert grid.shape == (24, 40, 3)


def test_save_depth_image(tmp_path, rng):
    import cv2

    d = rng.uniform(0, 10, size=(16, 16, 1)).astype(np.float32)
    path = tmp_path / "depth.png"
    save_depth_image(str(path), d)
    assert cv2.imread(str(path)) is not None


def test_tb_logger_real_events(tmp_path, rng):
    logger = TensorBoardLogger(str(tmp_path / "tb"))
    logger.add_scalar("loss/train", 0.5, 1)
    logger.add_scalars({"abs_rel": 0.2, "rmse": 0.6}, 1, prefix="metrics/")
    logger.add_image("predictions/sample_0",
                     rng.uniform(0, 1, size=(8, 8, 3)).astype(np.float32), 1)
    logger.add_histogram("weights/conv1",
                         rng.normal(size=(100_000,)).astype(np.float32), 1)
    logger.add_text("model/architecture", "baseline_unet", 0)
    logger.add_hparams({"lr": 1e-4, "arch": "baseline_unet"}, {"abs_rel": 0.2})
    logger.close()
    events = list((tmp_path / "tb").rglob("events.out.tfevents.*"))
    assert events, "no event files written"


def test_tb_logger_disabled(tmp_path):
    logger = TensorBoardLogger(str(tmp_path / "tb2"), enabled=False)
    logger.add_scalar("x", 1.0, 0)  # no-op, no crash
    logger.close()
    assert not (tmp_path / "tb2").exists()


def test_file_fallback_writer(tmp_path, rng):
    w = _FileFallbackWriter(str(tmp_path / "fb"))
    w.add_scalar("loss", 1.0, 0)
    w.add_histogram("h", rng.normal(size=100), 0)
    w.add_text("t", "hello", 0)
    w.add_image("img", rng.uniform(0, 1, size=(8, 8, 3)).astype(np.float32), 0)
    w.flush()
    w.close()
    assert (tmp_path / "fb" / "scalars.csv").read_text().count("\n") >= 2
    assert list((tmp_path / "fb" / "images").glob("*.png"))


def test_labeled_comparison_dimensions(rng):
    from cadepth_tpu.visualization import create_labeled_comparison

    rgb = rng.uniform(0, 1, size=(48, 64, 3)).astype(np.float32)
    gt = rng.uniform(0.5, 9.5, size=(48, 64, 1)).astype(np.float32)
    pred = rng.uniform(0.5, 9.5, size=(48, 64, 1)).astype(np.float32)
    strip = create_labeled_comparison(rgb, gt, pred)
    assert strip.shape == (48, 64 * 4, 3)
    assert strip.dtype == np.uint8


def test_histogram_reference_dimensions(rng):
    from cadepth_tpu.visualization import create_histogram

    depth = rng.uniform(0.5, 9.5, size=(32, 32)).astype(np.float32)
    h = create_histogram(depth, 0.1, 10.0)
    # eval-side histogram is a fixed 512x300 canvas (depth_visualizer.h:218-221)
    assert h.shape == (300, 512, 3)
    # bars drawn (not a blank canvas)
    assert (h != 255).any()
    empty = create_histogram(np.zeros((8, 8), np.float32), 0.1, 10.0)
    assert (empty == 255).all()


def test_comprehensive_visualization_composition(rng):
    from cadepth_tpu.visualization import create_comprehensive_visualization

    rgb = rng.uniform(0, 1, size=(48, 64, 3)).astype(np.float32)
    gt = rng.uniform(0.5, 9.5, size=(48, 64, 1)).astype(np.float32)
    pred = rng.uniform(0.5, 9.5, size=(48, 64, 1)).astype(np.float32)
    metrics = {"abs_rel": 0.12, "rmse": 0.5, "rmse_log": 0.2,
               "delta_1.25": 0.91}
    out = create_comprehensive_visualization(rgb, gt, pred, metrics)
    # comparison (48) + resized histogram row (300) + metrics panel (200)
    assert out.shape == (48 + 300 + 200, 64 * 4, 3)
    # metrics panel region is the grey 240-canvas with black text
    panel = out[-200:]
    assert (panel == 240).mean() > 0.5
    assert (panel < 100).any()


def test_tb_pr_curve_and_embedding(tmp_path, rng):
    logger = TensorBoardLogger(str(tmp_path / "tb3"))
    labels = (rng.uniform(size=64) > 0.5).astype(np.int64)
    preds = rng.uniform(size=64).astype(np.float32)
    logger.add_pr_curve("val/pr", labels, preds, 0)
    logger.add_embedding("features", rng.normal(size=(16, 8)), step=0)
    logger.flush()
    logger.close()
    assert any((tmp_path / "tb3").rglob("*")), "nothing written"
