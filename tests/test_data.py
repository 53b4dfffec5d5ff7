"""Data pipeline tests against the synthetic SUN RGB-D fixture
(hermetic — the reference's loader test required the real dataset)."""

import json

import numpy as np
import pytest

from cadepth_tpu.data import (
    SunRGBDValidator,
    save_manifest,
    load_manifest,
    AugmentationConfig,
    SunRGBDLoader,
    generate_synthetic_dataset,
    InputPipeline,
)
from cadepth_tpu.data.manifest import print_summary


@pytest.fixture(scope="module")
def dataset(tmp_path_factory):
    root = tmp_path_factory.mktemp("sunrgbd_fixture")
    manifest_path = generate_synthetic_dataset(root, images_per_sensor=3,
                                               with_rays=True)
    return str(root), manifest_path


def make_loader(dataset, **kwargs):
    root, manifest = dataset
    defaults = dict(target_height=48, target_width=64)
    defaults.update(kwargs)
    return SunRGBDLoader(f"{root}/sunrgbd", manifest, **defaults)


def test_validator_on_fixture(dataset, tmp_path):
    root, _ = dataset
    validator = SunRGBDValidator(f"{root}/sunrgbd")
    results = validator.validate_all_images()
    assert len(results) == 12
    assert all(r.is_valid for r in results)
    summary = print_summary(results)
    assert "Valid images: 12/12" in summary
    out = tmp_path / "manifest.json"
    manifest = save_manifest(results, str(out))
    # schema parity with validate_sunrgbd.cpp:273-313
    saved = json.loads(out.read_text())
    for key in ("dataset", "total_images", "valid_images", "sensor_counts", "images"):
        assert key in saved
    assert saved["valid_images"] == 12
    assert set(saved["sensor_counts"]) == {"kv1", "kv2", "realsense", "xtion"}
    img = saved["images"][0]
    for key in ("path", "sensor_type", "has_intrinsics", "has_rgb", "has_depth",
                "has_extrinsics", "has_scene_info", "rgb_resolution",
                "depth_resolution", "valid"):
        assert key in img
    assert manifest["valid_images"] == 12


def test_validator_flags_corrupt_intrinsics(dataset, tmp_path):
    import shutil
    root, _ = dataset
    bad_root = tmp_path / "bad"
    shutil.copytree(f"{root}/sunrgbd", bad_root)
    victim = sorted((bad_root / "kv1").iterdir())[0]
    (victim / "intrinsics.txt").write_text("-5 0 32 0 48 24 0 0 1\n")
    results = SunRGBDValidator(str(bad_root)).validate_all_images()
    invalid = [r for r in results if not r.is_valid]
    assert len(invalid) == 1
    assert "focal" in invalid[0].errors[0]


def test_loader_sample_shapes_and_ranges(dataset):
    loader = make_loader(dataset)
    assert len(loader) == 12
    s = loader.get_sample(0)
    assert s["rgb"].shape == (48, 64, 3)
    assert s["depth"].shape == (48, 64, 1)
    assert s["rays"].shape == (48, 64, 3)
    assert s["intrinsics"].shape == (3, 3)
    assert s["extrinsics"].shape == (4, 4)
    assert 0.0 <= s["rgb"].min() and s["rgb"].max() <= 1.0
    assert s["depth"].max() < 10.0  # mm -> m conversion applied
    assert s["scene_type"] == "bedroom"
    # rays.bin was present and resized; should be ~unit-norm
    norms = np.linalg.norm(s["rays"], axis=-1)
    np.testing.assert_allclose(norms, 1.0, atol=0.05)


def test_loader_intrinsics_rescaled(dataset):
    loader = make_loader(dataset, target_height=24, target_width=32)
    # kv1 native is 64x48 -> scale 0.5
    s = loader.get_sample(0)
    raw = np.loadtxt(str(s["image_path"]) + "/intrinsics.txt").reshape(3, 3)
    np.testing.assert_allclose(s["intrinsics"][0, 0], raw[0, 0] * 0.5, rtol=1e-5)
    np.testing.assert_allclose(s["intrinsics"][1, 2], raw[1, 2] * 0.5, rtol=1e-5)


def test_loader_sensor_filter(dataset):
    loader = make_loader(dataset, allowed_sensors=["kv1", "xtion"])
    assert len(loader) == 6
    loader.filter_by_sensor_type(["kv2"])
    assert len(loader) == 3


def test_loader_split_quirk_and_fix(dataset):
    # Reference parity: split does NOT filter samples (SURVEY §2.3 #1)...
    train = make_loader(dataset, split="train")
    test = make_loader(dataset, split="test")
    assert len(train) == len(test) == 12
    # ...unless the conscious fix is enabled.
    train_f = make_loader(dataset, split="train", split_filtering=True)
    test_f = make_loader(dataset, split="test", split_filtering=True)
    assert len(train_f) + len(test_f) == 12
    assert len(train_f) > 0 and len(test_f) > 0


def test_loader_compute_rays_matches_resized_k(dataset):
    loader = make_loader(dataset, compute_rays=True)
    s = loader.get_sample(0)
    k = s["intrinsics"]
    h, w = s["rgb"].shape[:2]
    u, v = np.meshgrid(np.arange(w, dtype=np.float32), np.arange(h, dtype=np.float32))
    rays = np.stack([(u - k[0, 2]) / k[0, 0], (v - k[1, 2]) / k[1, 1],
                     np.ones_like(u)], -1)
    rays /= np.linalg.norm(rays, axis=-1, keepdims=True)
    np.testing.assert_allclose(s["rays"], rays, atol=1e-5)


def test_augmentation_camera_consistency(dataset):
    loader = make_loader(dataset, split="train", compute_rays=True)
    cfg = AugmentationConfig(enable_color_jitter=False,
                             enable_horizontal_flip=True,
                             horizontal_flip_prob=1.0,
                             enable_random_crop=False,
                             random_seed=7)
    loader.enable_augmentation(cfg)
    s_aug = loader.get_sample(0)
    loader.disable_augmentation()
    s_raw = loader.get_sample(0)
    # flip mirrors the image and negates ray-x (sunrgbd_loader.cpp:416-430)
    np.testing.assert_allclose(s_aug["rgb"], s_raw["rgb"][:, ::-1], atol=1e-6)
    np.testing.assert_allclose(s_aug["rays"][..., 0],
                               -s_raw["rays"][:, ::-1, 0], atol=1e-6)
    w = s_raw["rgb"].shape[1]
    np.testing.assert_allclose(s_aug["intrinsics"][0, 2],
                               w - s_raw["intrinsics"][0, 2] - 1, rtol=1e-5)


def test_augmentation_crop_shifts_principal_point(dataset):
    loader = make_loader(dataset, split="train")
    cfg = AugmentationConfig(enable_color_jitter=False,
                             enable_horizontal_flip=False,
                             enable_random_crop=True,
                             crop_scale_min=0.7, crop_scale_max=0.9,
                             random_seed=3)
    loader.enable_augmentation(cfg)
    s = loader.get_sample(1)
    # output resized back to target dims after crop
    assert s["rgb"].shape == (48, 64, 3)
    assert np.isfinite(s["intrinsics"]).all()


def test_augmentation_deterministic_per_index(dataset):
    loader = make_loader(dataset, split="train")
    loader.enable_augmentation(AugmentationConfig(random_seed=11))
    a = loader.get_sample(2)
    b = loader.get_sample(2)
    np.testing.assert_array_equal(a["rgb"], b["rgb"])
    np.testing.assert_array_equal(a["intrinsics"], b["intrinsics"])


def test_color_jitter_formula(dataset):
    loader = make_loader(dataset, split="train")
    cfg = AugmentationConfig(enable_random_crop=False,
                             enable_horizontal_flip=False,
                             enable_color_jitter=True, random_seed=5)
    loader.enable_augmentation(cfg)
    s_aug = loader.get_sample(0)
    loader.disable_augmentation()
    s_raw = loader.get_sample(0)
    rng = np.random.default_rng([5, 0, 0])  # (seed, epoch, index)
    brightness = rng.uniform(0.8, 1.2)
    contrast = rng.uniform(0.8, 1.2)
    want = np.clip(s_raw["rgb"] * contrast + brightness - 1.0, 0.0, 1.0)
    np.testing.assert_allclose(s_aug["rgb"], want, atol=1e-6)


def test_get_batch(dataset):
    loader = make_loader(dataset)
    batch = loader.get_batch([0, 1, 2, 3])
    assert batch["rgb"].shape == (4, 48, 64, 3)
    assert batch["depth"].shape == (4, 48, 64, 1)
    assert batch["k4"].shape == (4, 4)
    np.testing.assert_allclose(batch["k4"][:, 0], batch["intrinsics"][:, 0, 0])


def test_input_pipeline_prefetch(dataset):
    loader = make_loader(dataset)
    pipe = InputPipeline(loader, batch_size=4, shuffle=True, seed=1,
                         num_threads=4, prefetch_depth=2)
    assert len(pipe) == 3
    batches = list(pipe)
    assert len(batches) == 3
    for b in batches:
        assert b["rgb"].shape == (4, 48, 64, 3)
        assert b["k4"].shape == (4, 4)
    # second epoch reshuffles but same count
    assert len(list(pipe)) == 3


def test_input_pipeline_sharded(dataset):
    import jax
    from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

    loader = make_loader(dataset)
    mesh = Mesh(np.array(jax.devices()[:4]), ("data",))
    sharding = NamedSharding(mesh, P("data"))
    pipe = InputPipeline(loader, batch_size=8, sharding=sharding, shuffle=False)
    batch = next(iter(pipe))
    assert batch["rgb"].sharding.is_equivalent_to(sharding, ndim=4)
    assert len(batch["rgb"].addressable_shards) == 4


def test_load_manifest(dataset):
    _, manifest_path = dataset
    m = load_manifest(manifest_path)
    assert m["valid_images"] == 12


def test_structured_synthetic_mode(tmp_path):
    manifest = generate_synthetic_dataset(
        tmp_path, images_per_sensor=1, seed=3, structured=True,
        sensor_specs={s: (64, 48, 64, 48)
                      for s in ("kv1", "kv2", "realsense", "xtion")})
    loader = SunRGBDLoader(f"{tmp_path}/sunrgbd", manifest,
                           target_height=48, target_width=64)
    s = loader.get_sample(0)
    d = s["depth"][s["depth"] > 0]
    # learnable scene: smooth plane + boxes, depth within sane range
    assert 0.5 < d.min() < d.max() < 10.0
    # RGB correlates with structure (not uniform noise)
    assert 0.02 < s["rgb"].std() < 0.45


def test_projective_synthetic_mode(tmp_path):
    manifest = generate_synthetic_dataset(
        tmp_path, images_per_sensor=2, seed=4, projective=True,
        focal_range=(0.6, 1.6),
        sensor_specs={s: (64, 48, 64, 48)
                      for s in ("kv1", "kv2", "realsense", "xtion")})
    loader = SunRGBDLoader(f"{tmp_path}/sunrgbd", manifest,
                           target_height=48, target_width=64)
    fxs = []
    for i in range(len(loader)):
        s = loader.get_sample(i)
        fxs.append(float(s["intrinsics"][0, 0]))
        d = s["depth"][s["depth"] > 0]
        assert d.max() <= 10.0 and d.min() > 1.0
    # focal lengths actually vary (the camera-ambiguity premise)
    assert max(fxs) / min(fxs) > 1.2


def test_pipeline_abandoned_iterator_releases_producer(dataset):
    """Breaking out of iteration must not leave the producer blocked
    (regression: whole-epoch future submission + blocking put)."""
    import threading

    loader = make_loader(dataset)
    pipe = InputPipeline(loader, batch_size=2, shuffle=False,
                         prefetch_depth=1, use_native="never")
    before = threading.active_count()
    it = iter(pipe)
    next(it)
    it.close()  # abandon mid-epoch
    # a second full pass still works and threads don't accumulate
    assert len(list(pipe)) == 6
    assert threading.active_count() <= before + 2


def test_augmentation_redraws_per_epoch(dataset):
    """set_epoch must change augmentation draws (ADVICE r1: a pure
    (seed, index) key froze each sample's augmentation for the whole run)."""
    loader = make_loader(dataset, split="train")
    loader.enable_augmentation(AugmentationConfig(random_seed=11))
    loader.set_epoch(0)
    a = loader.get_sample(2)
    loader.set_epoch(1)
    b = loader.get_sample(2)
    loader.set_epoch(0)
    c = loader.get_sample(2)
    # different epoch -> different draw; same epoch -> deterministic
    assert not np.array_equal(a["rgb"], b["rgb"])
    np.testing.assert_array_equal(a["rgb"], c["rgb"])


def test_pipeline_advances_loader_epoch(dataset):
    loader = make_loader(dataset, split="train")
    loader.enable_augmentation(AugmentationConfig(random_seed=11))
    pipe = InputPipeline(loader, batch_size=4, shuffle=False,
                         use_native="never")
    first = [np.asarray(b["rgb"]) for b in pipe]
    assert loader.epoch == 0
    second = [np.asarray(b["rgb"]) for b in pipe]
    assert loader.epoch == 1
    assert not all(np.array_equal(x, y) for x, y in zip(first, second))


def test_multiprocess_slicing_matches_single_process(dataset):
    """Global batches assembled from per-process local slices must equal the
    single-process batches (pipeline.py process_index/process_count path).

    Runs the real producer with _to_device stubbed to identity — a single
    JAX process cannot execute make_array_from_process_local_data for a
    fake process_count, but the index math and local assembly are exact.
    """
    import jax
    from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

    mesh = Mesh(np.array(jax.devices()[:4]), ("data",))
    sharding = NamedSharding(mesh, P("data"))

    def run(process_count, process_index):
        loader = make_loader(dataset)
        pipe = InputPipeline(loader, batch_size=4, shuffle=True, seed=7,
                             sharding=sharding, use_native="never",
                             process_index=process_index,
                             process_count=process_count)
        pipe._to_device = lambda b: b  # keep host arrays
        return list(pipe)

    oracle = run(1, 0)
    for process_count in (2, 4):
        shards = [run(process_count, p) for p in range(process_count)]
        assert all(len(s) == len(oracle) for s in shards)
        for b, want in enumerate(oracle):
            got = {
                k: np.concatenate([shards[p][b][k]
                                   for p in range(process_count)])
                for k in want
            }
            for k in want:
                np.testing.assert_array_equal(got[k], np.asarray(want[k]))


# -- packed (decode-once) dataset cache -------------------------------------


@pytest.fixture(scope="module")
def pack_dir(dataset, tmp_path_factory):
    from cadepth_tpu.data import pack_dataset

    root, manifest = dataset
    out = tmp_path_factory.mktemp("packed")
    meta = pack_dataset(f"{root}/sunrgbd", manifest, str(out),
                        target_height=48, target_width=64, num_threads=4)
    assert meta["num_samples"] == 12
    return str(out)


def test_packed_matches_live_loader_no_aug(dataset, pack_dir):
    from cadepth_tpu.data import PackedSunRGBDLoader

    live = make_loader(dataset, split="test", compute_rays=True)
    packed = PackedSunRGBDLoader(pack_dir, split="test")
    assert len(packed) == len(live)
    for i in (0, 5, 11):
        a, b = live.get_sample(i), packed.get_sample(i)
        np.testing.assert_array_equal(a["rgb"], b["rgb"])
        np.testing.assert_array_equal(a["depth"], b["depth"])
        np.testing.assert_array_equal(a["intrinsics"], b["intrinsics"])
        np.testing.assert_array_equal(a["extrinsics"], b["extrinsics"])
        np.testing.assert_array_equal(a["rays"], b["rays"])
        assert a["sensor_type"] == b["sensor_type"]


def test_packed_warm_prefault(pack_dir):
    """warm() prefaults the memmaps without changing read results."""
    from cadepth_tpu.data import PackedSunRGBDLoader

    packed = PackedSunRGBDLoader(pack_dir, split="test")
    before = packed.get_batch([0, 1])
    packed.warm()
    after = packed.get_batch([0, 1])
    for k in ("rgb", "depth", "intrinsics", "extrinsics"):
        np.testing.assert_array_equal(before[k], after[k])


def test_packed_fast_batch_parity(pack_dir):
    """fast_batch (vectorized assembly) must equal the per-sample
    pipeline path bit-for-bit, and correctly refuse when augmentation
    or a target-dim override requires per-sample work."""
    from cadepth_tpu.data import PackedSunRGBDLoader

    loader = PackedSunRGBDLoader(pack_dir, split="test", compute_rays=True,
                                 rays_on_device=True)
    assert loader.fast_batch_applicable()
    idx = [3, 0, 7]
    fast = loader.fast_batch(idx)
    pipe = InputPipeline(loader, batch_size=3, shuffle=False,
                         use_native="never")
    slow = pipe._assemble([loader.get_sample(i) for i in idx])
    assert set(fast) == set(slow)
    for k in fast:
        np.testing.assert_array_equal(fast[k], slow[k])

    # pipeline actually routes through fast_batch and yields equal batches
    got = next(iter(pipe))
    want = loader.fast_batch(list(range(3)))
    for k in want:
        np.testing.assert_array_equal(np.asarray(got[k]), want[k])

    # host-rays mode keeps the rays key
    loader_hr = PackedSunRGBDLoader(pack_dir, split="test", compute_rays=True)
    fb = loader_hr.fast_batch(idx)
    np.testing.assert_array_equal(
        fb["rays"], np.stack([loader_hr.get_sample(i)["rays"] for i in idx]))

    # augmentation on the train split disables the fast path
    tr = PackedSunRGBDLoader(pack_dir, split="train", rays_on_device=True)
    tr.enable_augmentation(tr.aug_config)
    assert not tr.fast_batch_applicable()
    assert tr.fast_batch(idx) is None
    # target-dim override disables it too
    ov = PackedSunRGBDLoader(pack_dir, split="test", target_height=24,
                             target_width=32, rays_on_device=True)
    assert not ov.fast_batch_applicable()


def test_packed_matches_live_loader_with_aug(dataset, pack_dir):
    """Augmentation acts on the post-first-resize sample, so the packed
    tail reproduces the live path bit-for-bit at equal (seed, epoch, i)."""
    from cadepth_tpu.data import PackedSunRGBDLoader

    cfg = AugmentationConfig(random_seed=3)
    live = make_loader(dataset, split="train", compute_rays=True)
    live.enable_augmentation(cfg)
    live.set_epoch(2)
    packed = PackedSunRGBDLoader(pack_dir, split="train")
    packed.enable_augmentation(cfg)
    packed.set_epoch(2)
    for i in (1, 7):
        a, b = live.get_sample(i), packed.get_sample(i)
        np.testing.assert_array_equal(a["rgb"], b["rgb"])
        np.testing.assert_array_equal(a["depth"], b["depth"])
        np.testing.assert_array_equal(a["intrinsics"], b["intrinsics"])
        np.testing.assert_array_equal(a["rays"], b["rays"])


def test_packed_sensor_filter_and_split(pack_dir):
    from cadepth_tpu.data import PackedSunRGBDLoader

    packed = PackedSunRGBDLoader(pack_dir, allowed_sensors=("kv1",))
    assert len(packed) == 3
    assert all(s["sensor_type"] == "kv1" for s in packed.sample_paths)
    packed.filter_by_sensor_type(["kv1", "xtion"])
    assert len(packed) == 6
    train = PackedSunRGBDLoader(pack_dir, split="train", split_filtering=True)
    test = PackedSunRGBDLoader(pack_dir, split="test", split_filtering=True)
    assert len(train) + len(test) == 12
    assert 0 < len(train) < 12


def test_packed_target_dim_override(pack_dir):
    from cadepth_tpu.data import PackedSunRGBDLoader

    packed = PackedSunRGBDLoader(pack_dir, target_height=24, target_width=32)
    s = packed.get_sample(0)
    assert s["rgb"].shape == (24, 32, 3)
    assert s["depth"].shape == (24, 32, 1)
    assert s["rays"].shape == (24, 32, 3)


def test_pipeline_over_packed_loader(pack_dir):
    from cadepth_tpu.data import PackedSunRGBDLoader

    packed = PackedSunRGBDLoader(pack_dir, split="train")
    packed.enable_augmentation()
    pipe = InputPipeline(packed, batch_size=4, shuffle=True, seed=0)
    assert not pipe._native  # packed loader must never use native decode
    batches = list(pipe)
    assert len(batches) == 3
    for b in batches:
        assert np.asarray(b["rgb"]).shape == (4, 48, 64, 3)
        assert np.asarray(b["k4"]).shape == (4, 4)


def test_packed_float16_mode(dataset, tmp_path):
    from cadepth_tpu.data import PackedSunRGBDLoader, pack_dataset

    root, manifest = dataset
    out = tmp_path / "pack16"
    pack_dataset(f"{root}/sunrgbd", manifest, str(out),
                 target_height=48, target_width=64, dtype="float16")
    live = make_loader(dataset, split="test", compute_rays=True)
    packed = PackedSunRGBDLoader(str(out), split="test")
    a, b = live.get_sample(0), packed.get_sample(0)
    assert b["rgb"].dtype == np.float32  # promoted on read
    np.testing.assert_allclose(a["rgb"], b["rgb"], atol=5e-4)
    np.testing.assert_allclose(a["depth"], b["depth"], rtol=1e-3)


def test_rays_on_device_omits_host_rays(dataset):
    """rays_on_device: batches carry no rays key (the jitted steps derive
    the grid on device and would overwrite host rays anyway), and the
    resulting train step is bit-identical to the host-rays path."""
    import jax

    from cadepth_tpu.config import config_from_dict
    from cadepth_tpu.training.schedule import build_lr_schedule
    from cadepth_tpu.training.train_state import (
        build_model_and_loss,
        build_optimizer,
        create_train_state,
        make_train_step,
    )

    loader_dev = make_loader(dataset, compute_rays=True, rays_on_device=True)
    loader_host = make_loader(dataset, compute_rays=True)
    s = loader_dev.get_sample(0)
    assert s["rays"] is None
    b_dev = loader_dev.get_batch([0, 1])
    b_host = loader_host.get_batch([0, 1])
    assert "rays" not in b_dev and "rays" in b_host

    pipe = InputPipeline(loader_dev, batch_size=4, shuffle=False,
                         use_native="never")
    first = next(iter(pipe))
    assert "rays" not in first

    cfg = config_from_dict({
        "model": {"architecture": "geometry_aware", "init_features": 4},
        "data": {"compute_rays": True},
        "optimization": {"lr_scheduler": "none", "lr_warmup_epochs": 0},
    })
    model, loss_fn = build_model_and_loss(cfg)
    tx = build_optimizer(cfg.optimization,
                         build_lr_schedule(cfg.optimization, 1, 1))
    state = create_train_state(cfg, model, tx, jax.random.PRNGKey(0),
                               jax.device_put(b_dev))
    step = make_train_step(cfg, model, loss_fn, tx, donate=False)
    _, logs_dev = step(state, jax.device_put(b_dev))
    _, logs_host = step(state, jax.device_put(b_host))
    np.testing.assert_array_equal(np.asarray(logs_dev["total_loss"]),
                                  np.asarray(logs_host["total_loss"]))
