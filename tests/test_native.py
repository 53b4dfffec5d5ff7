"""Native C++ data loader: parity with the Python loader + pipeline integration."""

import numpy as np
import pytest

from cadepth_tpu.data import (
    SunRGBDLoader,
    generate_synthetic_dataset,
    InputPipeline,
    AugmentationConfig,
)
from cadepth_tpu.data import native


@pytest.fixture(scope="module")
def dataset(tmp_path_factory):
    root = tmp_path_factory.mktemp("native_fixture")
    manifest = generate_synthetic_dataset(root, images_per_sensor=3, seed=7)
    return str(root), manifest


needs_native = pytest.mark.skipif(not native.available(),
                                  reason="native library not built")


@needs_native
def test_version():
    assert "cadepth_native" in native.version()


@needs_native
def test_ray_grid_matches_python():
    k = np.array([[100.0, 0, 32], [0, 110.0, 24], [0, 0, 1]], np.float32)
    got = native.ray_grid(k, 48, 64)
    import jax.numpy as jnp

    from cadepth_tpu.geometry import ray_grid as jray

    want = np.asarray(jray(jnp.asarray(k), 48, 64))
    np.testing.assert_allclose(got, want, atol=1e-5)


@needs_native
def test_load_batch_parity_no_augment(dataset):
    root, manifest = dataset
    loader = SunRGBDLoader(f"{root}/sunrgbd", manifest, target_height=48,
                           target_width=64, compute_rays=True)
    dirs = [str(s["image_dir"]) for s in loader.sample_paths[:6]]
    nb = native.load_batch(dirs, 48, 64, compute_rays=True)
    pb = loader.get_batch(range(6))
    for key in ("rgb", "depth", "intrinsics", "k4", "rays"):
        np.testing.assert_allclose(nb[key], pb[key], atol=2e-6, err_msg=key)


@needs_native
def test_load_batch_augmented_invariants(dataset):
    root, manifest = dataset
    augment = {"enable_crop": True, "crop_scale_min": 0.7,
               "crop_scale_max": 0.9, "enable_flip": True, "flip_prob": 0.5,
               "enable_jitter": True, "brightness_delta": 0.2,
               "contrast_delta": 0.2}
    loader = SunRGBDLoader(f"{root}/sunrgbd", manifest, target_height=48,
                           target_width=64, compute_rays=True)
    dirs = [str(s["image_dir"]) for s in loader.sample_paths[:4]]
    b = native.load_batch(dirs, 48, 64, augment=augment,
                          aug_seeds=[1, 2, 3, 4], compute_rays=True)
    assert b["rgb"].shape == (4, 48, 64, 3)
    assert (b["rgb"] >= 0).all() and (b["rgb"] <= 1).all()
    # rays must stay consistent with the augmented K (unit norm, exact formula)
    for i in range(4):
        k = b["intrinsics"][i]
        u, v = np.meshgrid(np.arange(64, dtype=np.float32),
                           np.arange(48, dtype=np.float32))
        rays = np.stack([(u - k[0, 2]) / k[0, 0], (v - k[1, 2]) / k[1, 1],
                         np.ones_like(u)], -1)
        rays /= np.linalg.norm(rays, axis=-1, keepdims=True)
        np.testing.assert_allclose(b["rays"][i], rays, atol=1e-5)
    # deterministic per seed
    b2 = native.load_batch(dirs, 48, 64, augment=augment,
                           aug_seeds=[1, 2, 3, 4], compute_rays=True)
    np.testing.assert_array_equal(b["rgb"], b2["rgb"])
    # different seeds differ
    b3 = native.load_batch(dirs, 48, 64, augment=augment,
                           aug_seeds=[9, 10, 11, 12], compute_rays=True)
    assert np.abs(b["rgb"] - b3["rgb"]).max() > 1e-4


@needs_native
def test_load_batch_error_path(dataset):
    with pytest.raises(IOError) as err:
        native.load_batch(["/nonexistent/dir"], 48, 64)
    assert "not found" in str(err.value)


@needs_native
def test_pipeline_native_matches_python(dataset):
    root, manifest = dataset
    loader = SunRGBDLoader(f"{root}/sunrgbd", manifest, target_height=48,
                           target_width=64, compute_rays=True)
    pipe_native = InputPipeline(loader, batch_size=4, shuffle=False,
                                use_native="always")
    pipe_python = InputPipeline(loader, batch_size=4, shuffle=False,
                                use_native="never")
    for nb, pb in zip(pipe_native, pipe_python):
        for key in ("rgb", "depth", "k4", "rays"):
            np.testing.assert_allclose(np.asarray(nb[key]),
                                       np.asarray(pb[key]), atol=2e-6,
                                       err_msg=key)


@needs_native
def test_pipeline_native_fallback_without_compute_rays(dataset):
    root, manifest = dataset
    loader = SunRGBDLoader(f"{root}/sunrgbd", manifest, target_height=48,
                           target_width=64, compute_rays=False)
    pipe = InputPipeline(loader, batch_size=4, use_native="auto")
    assert not pipe._native  # rays.bin path falls back to Python
    with pytest.raises(RuntimeError):
        InputPipeline(loader, batch_size=4, use_native="always")
