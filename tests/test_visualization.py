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
