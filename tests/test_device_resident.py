"""Device-resident data path: HBM gather parity, on-device augmentation
vs a host cv2 oracle fed identical draws, and trainer integration."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from cadepth_tpu.data import (
    DeviceDataset,
    DevicePipeline,
    PackedSunRGBDLoader,
    generate_synthetic_dataset,
    pack_dataset,
)


@pytest.fixture(scope="module")
def pack_dir(tmp_path_factory):
    root = tmp_path_factory.mktemp("devres")
    manifest = generate_synthetic_dataset(
        str(root), images_per_sensor=3, seed=11,
        sensor_specs={s: (64, 48, 64, 48)
                      for s in ("kv1", "kv2", "realsense", "xtion")})
    out = root / "packed"
    pack_dataset(f"{root}/sunrgbd", manifest, str(out),
                 target_height=48, target_width=64, num_threads=4)
    return str(out)


def make_ds(pack_dir, split="train", **kw):
    loader = PackedSunRGBDLoader(pack_dir, split=split, compute_rays=True,
                                 rays_on_device=True)
    return loader, DeviceDataset(loader, **kw)


def test_no_aug_batches_match_fast_batch(pack_dir):
    loader, ds = make_ds(pack_dir)
    idx = [5, 2, 9, 0]
    got = ds._gather(jnp.asarray(idx, jnp.int32), jnp.int32(0), augment=False)
    want = loader.fast_batch(idx)
    assert set(got) == set(want)
    for k in want:
        np.testing.assert_allclose(np.asarray(got[k]), want[k],
                                   rtol=0, atol=0)


def test_epoch_iteration_contract(pack_dir):
    _, ds = make_ds(pack_dir)
    pipe = DevicePipeline(ds, batch_size=4, shuffle=True, seed=3)
    assert len(pipe) == len(ds) // 4
    e0 = [np.asarray(b["rgb"]) for b in pipe]
    e1 = [np.asarray(b["rgb"]) for b in pipe]
    assert len(e0) == len(pipe)
    # different epochs shuffle differently
    assert not all(np.array_equal(a, b) for a, b in zip(e0, e1))
    # same (seed, epoch) is deterministic
    pipe2 = DevicePipeline(ds, batch_size=4, shuffle=True, seed=3)
    e0b = [np.asarray(b["rgb"]) for b in pipe2]
    for a, b in zip(e0, e0b):
        np.testing.assert_array_equal(a, b)


def _host_oracle(rgb, depth, k, key, cfg):
    """Numpy/cv2 reimplementation of the host augment+resize tail, fed
    the SAME threefry draws as the device path."""
    import cv2

    H, W = rgb.shape[:2]
    ks = jax.random.split(key, 6)
    scale = float(jax.random.uniform(ks[0], (), jnp.float32,
                                     cfg.crop_scale_min, cfg.crop_scale_max))
    ch, cw = int(np.floor(H * scale)), int(np.floor(W * scale))
    ux = int(np.floor(float(jax.random.uniform(ks[1], ()))
                      * (max(1, W - cw) + 1)))
    uy = int(np.floor(float(jax.random.uniform(ks[2], ()))
                      * (max(1, H - ch) + 1)))
    flip = float(jax.random.uniform(ks[3], ())) < cfg.horizontal_flip_prob
    brightness = float(jax.random.uniform(
        ks[4], (), jnp.float32,
        1.0 - cfg.brightness_delta, 1.0 + cfg.brightness_delta))
    contrast = float(jax.random.uniform(
        ks[5], (), jnp.float32,
        1.0 - cfg.contrast_delta, 1.0 + cfg.contrast_delta))

    # host order: crop -> flip -> jitter -> resize back (sunrgbd.py)
    rgb = rgb[uy:uy + ch, ux:ux + cw]
    depth = depth[uy:uy + ch, ux:ux + cw]
    k = k.copy()
    k[0, 2] -= ux
    k[1, 2] -= uy
    if flip:
        rgb = np.ascontiguousarray(rgb[:, ::-1])
        depth = np.ascontiguousarray(depth[:, ::-1])
        k[0, 2] = rgb.shape[1] - k[0, 2] - 1
    rgb = np.clip(rgb * contrast + brightness - 1.0, 0.0, 1.0)
    sx, sy = W / rgb.shape[1], H / rgb.shape[0]
    rgb = cv2.resize(rgb, (W, H), interpolation=cv2.INTER_LINEAR)
    depth = cv2.resize(depth[..., 0], (W, H),
                       interpolation=cv2.INTER_NEAREST)[..., None]
    k[0, 0] *= sx
    k[1, 1] *= sy
    k[0, 2] *= sx
    k[1, 2] *= sy
    return rgb, depth, k


def test_on_device_augment_matches_host_oracle(pack_dir):
    loader, ds = make_ds(pack_dir)
    loader.enable_augmentation(loader.aug_config)
    cfg = ds.aug_config
    idx = list(range(8))
    for epoch in (0, 3):
        got = ds._gather(jnp.asarray(idx, jnp.int32), jnp.int32(epoch),
                         augment=True)
        base = jax.random.fold_in(jax.random.PRNGKey(cfg.random_seed), epoch)
        for j, i in enumerate(idx):
            key = jax.random.fold_in(base, i)
            rgb0 = np.asarray(loader._rgb[loader.sample_paths[i]["row"]],
                              np.float32)
            depth0 = np.asarray(loader._depth[loader.sample_paths[i]["row"]],
                                np.float32)
            k0 = np.asarray(loader._intrinsics[loader.sample_paths[i]["row"]],
                            np.float32)
            rgb, depth, k = _host_oracle(rgb0, depth0, k0, key, cfg)
            np.testing.assert_allclose(np.asarray(got["rgb"][j]), rgb,
                                       atol=2e-5, rtol=0)
            np.testing.assert_array_equal(np.asarray(got["depth"][j]), depth)
            np.testing.assert_allclose(np.asarray(got["intrinsics"][j]), k,
                                       atol=1e-4, rtol=0)


def test_device_resident_trainer_smoke(pack_dir, tmp_path):
    from cadepth_tpu.config import config_from_dict
    from cadepth_tpu.training.trainer import Trainer

    cfg = config_from_dict({
        "experiment": {"name": "devres_smoke", "seed": 0},
        "model": {"architecture": "baseline_unet", "init_features": 4},
        "data": {"packed_dir": pack_dir, "device_resident": True,
                 "input_height": 48, "input_width": 64,
                 "compute_rays": True,
                 "augmentation": {"random_crop": True,
                                  "horizontal_flip": True,
                                  "color_jitter": True}},
        "training": {"batch_size": 4, "num_epochs": 2, "use_amp": True},
        "optimization": {"learning_rate": 1e-3, "lr_scheduler": "none",
                         "lr_warmup_epochs": 0},
        "checkpointing": {"checkpoint_dir": str(tmp_path / "ckpt")},
        "logging": {"log_dir": str(tmp_path / "logs"),
                    "tensorboard": {"enabled": False}},
        "validation": {"interval": 1},
    })
    tr = Trainer(cfg)
    assert isinstance(tr.train_pipe, DevicePipeline)
    # train/val share one HBM upload under the non-filtering quirk
    assert tr.train_pipe.dataset.rgb is tr.val_pipe.dataset.rgb
    tr.train()
    assert np.isfinite(tr.best_metric)


def test_sharded_device_dataset_gather(pack_dir):
    """Mesh mode: dataset sharded along the data axis, each device
    gathers from its local shard; contents must match the pack."""
    from cadepth_tpu.parallel.mesh import make_mesh

    mesh = make_mesh(4)
    loader = PackedSunRGBDLoader(pack_dir, split="train", compute_rays=True,
                                 rays_on_device=True)
    ds = DeviceDataset(loader, mesh=mesh)
    n = len(loader)
    S = ds.shard_size
    assert ds.n_shards == 4 and S * 4 >= n
    src = np.stack([np.asarray(loader._rgb[s["row"]], np.float32)
                    for s in loader.sample_paths])

    batch_size, b_local = 8, 2
    got = list(ds.batches(batch_size, shuffle=False, epoch=0))
    assert len(got) == ds.batches_per_epoch(batch_size) == len(got)
    for t, b in enumerate(got):
        rows = []
        for d in range(4):
            for j in range(b_local):
                padded = d * S + t * b_local + j
                rows.append(padded if padded < n else padded % n)
        np.testing.assert_array_equal(np.asarray(b["rgb"]), src[rows])
        assert b["rgb"].sharding.spec == jax.sharding.PartitionSpec("data")

    # shuffled epochs cover each shard without pad rows and are
    # deterministic per (seed, epoch)
    a = [np.asarray(b["rgb"]) for b in ds.batches(8, shuffle=True, seed=5,
                                                  epoch=1)]
    b2 = [np.asarray(b["rgb"]) for b in ds.batches(8, shuffle=True, seed=5,
                                                   epoch=1)]
    for x, y in zip(a, b2):
        np.testing.assert_array_equal(x, y)


def test_sharded_quantized_matches_single_device(pack_dir):
    """quantized storage composes with the mesh-sharded dataset: the
    shard_map gather must dequantize identically to the single-device
    quantized gather."""
    from cadepth_tpu.parallel.mesh import make_mesh

    mesh = make_mesh(4)
    loader = PackedSunRGBDLoader(pack_dir, split="train", compute_rays=True,
                                 rays_on_device=True)
    loader.enable_augmentation(loader.aug_config)
    dsq = DeviceDataset(loader, rgb_dtype=jnp.uint8,
                        depth_dtype=jnp.uint16)
    dsm = DeviceDataset(loader, rgb_dtype=jnp.uint8,
                        depth_dtype=jnp.uint16, mesh=mesh)
    assert dsm.rgb.dtype == jnp.uint8 and dsm.depth.dtype == jnp.uint16
    # same physical samples: shard d holds padded rows [d*S, (d+1)*S);
    # pick indices that avoid pad rows so both gathers see real data
    S = dsm.shard_size
    local = np.array([0, 1], np.int32)
    sharded_idx = np.concatenate([local + d * S for d in range(4)])
    sharded_idx = np.minimum(sharded_idx, len(loader) - 1)
    got = dsm._gather(jnp.asarray(np.tile(local, 4)), jnp.int32(0),
                      augment=False)
    want = dsq._gather(jnp.asarray(sharded_idx), jnp.int32(0),
                       augment=False)
    for k in want:
        np.testing.assert_array_equal(np.asarray(want[k]),
                                      np.asarray(got[k]), err_msg=k)


def test_sharded_device_dataset_augment_runs(pack_dir):
    from cadepth_tpu.parallel.mesh import make_mesh

    mesh = make_mesh(4)
    loader = PackedSunRGBDLoader(pack_dir, split="train", compute_rays=True,
                                 rays_on_device=True)
    loader.enable_augmentation(loader.aug_config)
    ds = DeviceDataset(loader, mesh=mesh)
    batches = list(ds.batches(8, shuffle=False, epoch=2, augment=True))
    assert batches
    rgb = np.asarray(batches[0]["rgb"])
    assert np.isfinite(rgb).all() and rgb.min() >= 0.0 and rgb.max() <= 1.0
    # per-sample keys differ across shard slots (same local index,
    # different device) — augmented outputs should not all coincide
    assert not np.array_equal(rgb[0], rgb[2])
    again = np.asarray(next(iter(ds.batches(8, shuffle=False, epoch=2,
                                            augment=True)))["rgb"])
    np.testing.assert_array_equal(rgb, again)


def test_sharded_device_dataset_2d_mesh(pack_dir):
    """data x space mesh: samples shard along 'data', replicate along
    'space'; gathered batches match the pack."""
    from cadepth_tpu.parallel.mesh import make_mesh_2d

    mesh = make_mesh_2d(8, spatial=2)  # (4, 2) data x space
    loader = PackedSunRGBDLoader(pack_dir, split="train", compute_rays=True,
                                 rays_on_device=True)
    ds = DeviceDataset(loader, mesh=mesh)
    assert ds.n_shards == 4
    b = next(iter(ds.batches(8, shuffle=False, epoch=0)))
    src = np.stack([np.asarray(loader._rgb[s["row"]], np.float32)
                    for s in loader.sample_paths])
    S, n = ds.shard_size, len(loader)
    rows = [min(d * S + j, (d * S + j) % n if d * S + j >= n else d * S + j)
            for d in range(4) for j in range(2)]
    np.testing.assert_array_equal(np.asarray(b["rgb"]), src[rows])


def test_evaluator_device_resident_sweep_matches_host(pack_dir, tmp_path):
    """Device-resident eval sweep = host-pipe sweep, per sample, incl.
    the trimmed ragged tail batch."""
    from cadepth_tpu.config import config_from_dict
    from cadepth_tpu.evaluation import EvaluationConfig, ModelEvaluator
    from cadepth_tpu.training import build_optimizer, create_train_state
    from cadepth_tpu.training.train_state import build_model_and_loss

    cfg = config_from_dict({
        "data": {"input_height": 48, "input_width": 64,
                 "compute_rays": True},
        "model": {"architecture": "baseline_unet", "init_features": 4},
    })
    loader = PackedSunRGBDLoader(pack_dir, split="test", compute_rays=True,
                                 rays_on_device=True)
    model, _ = build_model_and_loss(cfg)
    tx = build_optimizer(cfg.optimization, lambda s: 1e-4)
    batch = jax.device_put(loader.get_batch([0, 1]))
    state = create_train_state(cfg, model, tx, jax.random.PRNGKey(0), batch)
    evaluator = ModelEvaluator(cfg, model, state,
                               EvaluationConfig(warmup_iterations=1,
                                                batch_size=5))  # 12 % 5 != 0
    host = evaluator.evaluate(loader)
    dev = evaluator.evaluate(loader, device_resident=True)
    assert dev.num_samples == host.num_samples == len(loader)
    for a, b in zip(host.per_sample, dev.per_sample):
        for k in a:
            np.testing.assert_allclose(a[k], b[k], rtol=1e-6, atol=1e-7)

    # chunked + quantized sweep (the capacity path for packs bigger
    # than HBM): same exact full sweep; depth is stored mm-exact so
    # metrics differ only by rgb u8 rounding through the network
    cfg_q = config_from_dict({
        "data": {"input_height": 48, "input_width": 64,
                 "compute_rays": True,
                 "device_resident_chunk_samples": 5,
                 "device_resident_dtype": "quantized"},
        "model": {"architecture": "baseline_unet", "init_features": 4},
    })
    evaluator_q = ModelEvaluator(cfg_q, model, state,
                                 EvaluationConfig(warmup_iterations=1,
                                                  batch_size=5))
    devq = evaluator_q.evaluate(loader, device_resident=True)
    assert devq.num_samples == len(loader)
    for a, b in zip(host.per_sample, devq.per_sample):
        for k in a:
            np.testing.assert_allclose(a[k], b[k], rtol=2e-3, atol=2e-3,
                                       err_msg=k)


def test_geometry_device_resident_trains(pack_dir, tmp_path):
    """Flagship integration: geometry_aware + sharded HBM feed + aug;
    on-device K updates must flow into the step's ray derivation."""
    from cadepth_tpu.config import config_from_dict
    from cadepth_tpu.training.trainer import Trainer

    cfg = config_from_dict({
        "experiment": {"name": "devres_geo", "seed": 1},
        "model": {"architecture": "geometry_aware_lightweight",
                  "init_features": 4},
        "data": {"packed_dir": pack_dir, "device_resident": True,
                 "input_height": 48, "input_width": 64,
                 "compute_rays": True},
        "training": {"batch_size": 4, "num_epochs": 1, "use_amp": True},
        "optimization": {"learning_rate": 1e-3, "lr_scheduler": "none",
                         "lr_warmup_epochs": 0},
        "checkpointing": {"checkpoint_dir": str(tmp_path / "ckpt")},
        "logging": {"log_dir": str(tmp_path / "logs"),
                    "tensorboard": {"enabled": False}},
    })
    tr = Trainer(cfg)
    metrics = tr.train()
    assert np.isfinite(metrics.get("abs_rel", np.nan))
    tr.close()


def test_tail_batch_trimmed_not_duplicated(pack_dir):
    """drop_remainder=False must yield a TRIMMED tail: a full sweep sees
    every sample exactly once (a padded tail would double-count head
    samples and bias any metric computed through it)."""
    loader, ds = make_ds(pack_dir)
    n = len(ds)
    batch = 5  # 12 % 5 == 2 -> ragged tail
    got = list(ds.batches(batch, shuffle=False, drop_remainder=False,
                          augment=False))
    assert [b["rgb"].shape[0] for b in got] == [5, 5, 2]
    assert ds.batches_per_epoch(batch, drop_remainder=False) == len(got)
    swept = np.concatenate([np.asarray(b["rgb"]) for b in got])
    src = np.stack([np.asarray(loader._rgb[s["row"]], np.float32)
                    for s in loader.sample_paths])
    np.testing.assert_array_equal(swept, src[:n])


def test_sharded_uneven_shards_full_coverage(pack_dir):
    """Smaller shards wrap around their permutation so the epoch follows
    the largest shard; with drop_remainder=False every real sample
    appears at least once (ADVICE r2: valid_min iteration silently
    dropped larger shards' extras)."""
    from cadepth_tpu.parallel.mesh import make_mesh

    mesh = make_mesh(4)
    loader = PackedSunRGBDLoader(pack_dir, split="train", compute_rays=True,
                                 rays_on_device=True)
    ds = DeviceDataset(loader, mesh=mesh)
    S, n_lim = ds.shard_size, 10  # valids per shard: [3, 3, 3, 1]
    got = list(ds.batches(8, shuffle=False, epoch=0, drop_remainder=False,
                          max_samples=n_lim))
    assert len(got) == ds.batches_per_epoch(8, max_samples=n_lim,
                                            drop_remainder=False) == 2
    rows_seen = set()
    src = np.stack([np.asarray(loader._rgb[s["row"]], np.float32)
                    for s in loader.sample_paths])
    for b in got:
        rgb = np.asarray(b["rgb"])
        for img in rgb:
            match = np.where((src == img).all(axis=(1, 2, 3)))[0]
            assert match.size
            rows_seen.add(int(match[0]))
    assert rows_seen == set(range(n_lim))


def test_geometry_device_resident_without_compute_rays(pack_dir, tmp_path):
    """device_resident feeds never carry a rays key; with
    data.compute_rays=false the steps must still derive rays on device
    instead of KeyError-ing at trace time (ADVICE r2 item 1)."""
    from cadepth_tpu.config import config_from_dict
    from cadepth_tpu.training.trainer import Trainer

    cfg = config_from_dict({
        "experiment": {"name": "devres_norays", "seed": 1},
        "model": {"architecture": "geometry_aware_lightweight",
                  "init_features": 4},
        "data": {"packed_dir": pack_dir, "device_resident": True,
                 "input_height": 48, "input_width": 64,
                 "compute_rays": False},
        "training": {"batch_size": 4, "num_epochs": 1, "use_amp": True},
        "optimization": {"learning_rate": 1e-3, "lr_scheduler": "none",
                         "lr_warmup_epochs": 0},
        "checkpointing": {"checkpoint_dir": str(tmp_path / "ckpt")},
        "logging": {"log_dir": str(tmp_path / "logs"),
                    "tensorboard": {"enabled": False}},
    })
    tr = Trainer(cfg)
    metrics = tr.train()
    assert np.isfinite(metrics.get("abs_rel", np.nan))
    tr.close()


def test_chunked_matches_resident_bit_exact(pack_dir):
    """Chunk-rotating mode must produce the SAME epoch stream as the
    fully-resident dataset — same permutation slices, same augmentation
    key streams — for both augment settings and ragged tails."""
    from cadepth_tpu.data import ChunkedDeviceDataset

    loader, ds = make_ds(pack_dir)
    loader.enable_augmentation(loader.aug_config)
    chunked = ChunkedDeviceDataset(loader, chunk_samples=5)  # -> 4/batch=4
    for augment in (False, True):
        for drop in (True, False):
            want = list(ds.batches(4, shuffle=True, seed=9, epoch=2,
                                   augment=augment, drop_remainder=drop))
            got = list(chunked.batches(4, shuffle=True, seed=9, epoch=2,
                                       augment=augment, drop_remainder=drop))
            assert len(got) == len(want)
            for bw, bg in zip(want, got):
                for k in bw:
                    np.testing.assert_array_equal(
                        np.asarray(bw[k]), np.asarray(bg[k]),
                        err_msg=f"{k} augment={augment} drop={drop}")


def test_chunked_trainer_smoke(pack_dir, tmp_path):
    from cadepth_tpu.config import config_from_dict
    from cadepth_tpu.data import ChunkedDeviceDataset
    from cadepth_tpu.training.trainer import Trainer

    cfg = config_from_dict({
        "experiment": {"name": "devres_chunked", "seed": 0},
        "model": {"architecture": "baseline_unet", "init_features": 4},
        "data": {"packed_dir": pack_dir, "device_resident": True,
                 "device_resident_chunk_samples": 8,
                 "input_height": 48, "input_width": 64,
                 "compute_rays": True,
                 "augmentation": {"random_crop": True,
                                  "horizontal_flip": True,
                                  "color_jitter": True}},
        "training": {"batch_size": 4, "num_epochs": 2, "use_amp": True},
        "optimization": {"learning_rate": 1e-3, "lr_scheduler": "none",
                         "lr_warmup_epochs": 0},
        "checkpointing": {"checkpoint_dir": str(tmp_path / "ckpt")},
        "logging": {"log_dir": str(tmp_path / "logs"),
                    "tensorboard": {"enabled": False}},
        "validation": {"interval": 1},
        # chunked mode is the single-device capacity tool (mesh raises)
        "hardware": {"data_parallel": False},
    })
    tr = Trainer(cfg)
    assert isinstance(tr.train_pipe.dataset, ChunkedDeviceDataset)
    tr.train()
    assert np.isfinite(tr.best_metric)
    tr.close()


def test_quantized_storage_semantics(pack_dir):
    """uint8 RGB / uint16-mm depth storage (the dataset's native
    encodings): the STORED depth is mm-exact (the synthetic fixture
    writes mm PNGs like SUN RGB-D, and the pack's nearest depth resize
    preserves mm values); the fp32 materialization is within 1 ulp of
    the host loader's `mm / 1000.0` (XLA strength-reduces the jitted
    divide to a reciprocal multiply), rgb within the u8 rounding
    step."""
    loader, ds32 = make_ds(pack_dir)
    dsq = DeviceDataset(loader, rgb_dtype=jnp.uint8,
                        depth_dtype=jnp.uint16)
    assert dsq.rgb.dtype == jnp.uint8 and dsq.depth.dtype == jnp.uint16
    assert dsq.nbytes() < ds32.nbytes() / 3.0
    # the stored u16 values ARE the exact millimeters of the pack
    np.testing.assert_array_equal(
        np.asarray(dsq.depth, np.float32),
        np.rint(np.asarray(ds32.depth) * 1000.0))
    idx = jnp.asarray([1, 4, 7, 10], jnp.int32)
    a = ds32._gather(idx, jnp.int32(0), augment=False)
    b = dsq._gather(idx, jnp.int32(0), augment=False)
    np.testing.assert_allclose(np.asarray(a["depth"]),
                               np.asarray(b["depth"]), rtol=1.5e-7)
    np.testing.assert_array_equal(np.asarray(a["intrinsics"]),
                                  np.asarray(b["intrinsics"]))
    np.testing.assert_allclose(np.asarray(a["rgb"]), np.asarray(b["rgb"]),
                               rtol=0, atol=0.5 / 255.0 + 1e-7)
    # augmentation runs on the dequantized fp32 values — same bounds
    # (interpolation is a convex combination, jitter is clipped affine;
    # contrast<=1.3 stretches the rgb quantization step by <=1.3)
    aa = ds32._gather(idx, jnp.int32(1), augment=True)
    bb = dsq._gather(idx, jnp.int32(1), augment=True)
    np.testing.assert_allclose(np.asarray(aa["depth"]),
                               np.asarray(bb["depth"]), rtol=1.5e-7)
    np.testing.assert_allclose(np.asarray(aa["rgb"]), np.asarray(bb["rgb"]),
                               rtol=0, atol=1.3 * 0.5 / 255.0 + 1e-6)


def test_chunked_quantized_matches_resident_quantized(pack_dir):
    """Quantized chunked (compact host copies) == quantized resident,
    bit-exact, in both prefetch modes."""
    from cadepth_tpu.data import ChunkedDeviceDataset

    loader, _ = make_ds(pack_dir)
    loader.enable_augmentation(loader.aug_config)
    dsq = DeviceDataset(loader, rgb_dtype=jnp.uint8,
                        depth_dtype=jnp.uint16)
    chq = ChunkedDeviceDataset(loader, chunk_samples=5,
                               rgb_dtype=jnp.uint8,
                               depth_dtype=jnp.uint16)
    want = list(dsq.batches(4, shuffle=True, seed=5, epoch=1,
                            augment=True))
    for mode in ("thread", "serial"):
        got = list(chq.batches(4, shuffle=True, seed=5, epoch=1,
                               augment=True, prefetch=mode))
        assert len(got) == len(want)
        for bw, bg in zip(want, got):
            for k in bw:
                np.testing.assert_array_equal(
                    np.asarray(bw[k]), np.asarray(bg[k]),
                    err_msg=f"{k} prefetch={mode}")


def test_chunked_thread_mode_slot_reuse_race(pack_dir):
    """Regression: on the CPU backend device_put ALIASES numpy buffers,
    so slot reuse without private copies corrupted pending gathers
    (~7% of chunks). Repeat the stream comparison enough times that the
    original race would fire with >95% probability."""
    from cadepth_tpu.data import ChunkedDeviceDataset

    loader, ds = make_ds(pack_dir)
    want = list(ds.batches(4, shuffle=True, seed=13, epoch=0,
                           augment=False))
    W = [{k: np.asarray(v) for k, v in b.items()} for b in want]
    ch = ChunkedDeviceDataset(loader, chunk_samples=5)
    assert ch._slot_alias_risk  # CPU backend in tests
    for trial in range(12):
        got = list(ch.batches(4, shuffle=True, seed=13, epoch=0,
                              augment=False, prefetch="thread"))
        for i, g in enumerate(got):
            for k in g:
                np.testing.assert_array_equal(
                    W[i][k], np.asarray(g[k]),
                    err_msg=f"trial {trial} batch {i} key {k}")


def test_chunked_batch_bigger_than_chunk(pack_dir):
    """batch_size > chunk_samples: batches() rounds the effective chunk
    up to the batch size and the staging slots must grow with it
    (regression: np.take used to crash on the too-small slot)."""
    from cadepth_tpu.data import ChunkedDeviceDataset

    loader, ds = make_ds(pack_dir)
    chunked = ChunkedDeviceDataset(loader, chunk_samples=4)
    want = list(ds.batches(8, shuffle=True, seed=3, epoch=0))
    got = list(chunked.batches(8, shuffle=True, seed=3, epoch=0))
    assert len(got) == len(want) > 0
    for bw, bg in zip(want, got):
        for k in bw:
            np.testing.assert_array_equal(np.asarray(bw[k]),
                                          np.asarray(bg[k]), err_msg=k)


def test_chunked_quantized_requires_both(pack_dir):
    from cadepth_tpu.data import ChunkedDeviceDataset

    loader, _ = make_ds(pack_dir)
    with pytest.raises(ValueError, match="all-or-nothing"):
        ChunkedDeviceDataset(loader, chunk_samples=5,
                             rgb_dtype=jnp.uint8)


def test_quantized_trainer_smoke(pack_dir, tmp_path):
    """device_resident_dtype: quantized end to end through the Trainer."""
    from cadepth_tpu.config import config_from_dict
    from cadepth_tpu.training.trainer import Trainer

    cfg = config_from_dict({
        "experiment": {"name": "devres_quant", "seed": 0},
        "model": {"architecture": "baseline_unet", "init_features": 4},
        "data": {"packed_dir": pack_dir, "device_resident": True,
                 "device_resident_dtype": "quantized",
                 "input_height": 48, "input_width": 64,
                 "compute_rays": True},
        "training": {"batch_size": 4, "num_epochs": 1, "use_amp": True},
        "optimization": {"learning_rate": 1e-3, "lr_scheduler": "none",
                         "lr_warmup_epochs": 0},
        "checkpointing": {"checkpoint_dir": str(tmp_path / "ckpt")},
        "logging": {"log_dir": str(tmp_path / "logs"),
                    "tensorboard": {"enabled": False}},
        "hardware": {"data_parallel": False},
    })
    tr = Trainer(cfg)
    assert tr.train_pipe.dataset.rgb.dtype == jnp.uint8
    assert tr.train_pipe.dataset.depth.dtype == jnp.uint16
    metrics = tr.train()
    assert np.isfinite(metrics.get("abs_rel", np.nan))
    tr.close()


def test_device_resident_requires_pack_resolution(pack_dir):
    loader = PackedSunRGBDLoader(pack_dir, split="train", target_height=32,
                                 target_width=32, rays_on_device=True)
    with pytest.raises(ValueError, match="target resolution"):
        DeviceDataset(loader)


def test_share_storage_from_shares_buffers_keeps_identity(pack_dir):
    """Explicit shared-storage construction (one HBM upload serves both
    splits under the reference's non-filtering split quirk): the val
    instance must alias the donor's device buffers but keep its OWN
    split/augmentation identity — the invariant the old __new__ +
    __dict__.update shortcut could not guarantee."""
    train_loader = PackedSunRGBDLoader(pack_dir, split="train",
                                       compute_rays=True,
                                       rays_on_device=True)
    train_loader.enable_augmentation(train_loader.aug_config)
    train_ds = DeviceDataset(train_loader)
    val_loader = PackedSunRGBDLoader(pack_dir, split="val",
                                     compute_rays=True,
                                     rays_on_device=True)
    val_ds = DeviceDataset(val_loader, share_storage_from=train_ds)
    # storage aliased: same device arrays, no second upload
    assert val_ds.rgb is train_ds.rgb
    assert val_ds.depth is train_ds.depth
    assert val_ds.k is train_ds.k
    # identity NOT aliased
    assert val_ds.split == "val" and train_ds.split == "train"
    assert not val_ds.augmentation_enabled
    assert train_ds.augmentation_enabled
    # gather parity through the shared buffers
    idx = [1, 7, 3]
    got = val_ds._gather(jnp.asarray(idx, jnp.int32), jnp.int32(0),
                         augment=False)
    want = val_loader.fast_batch(idx)
    for k in want:
        np.testing.assert_array_equal(np.asarray(got[k]), want[k])


def test_share_storage_from_rejects_mismatch(pack_dir):
    _, train_ds = make_ds(pack_dir, split="train")
    # resolution mismatch
    small = PackedSunRGBDLoader(pack_dir, split="val", target_height=32,
                                target_width=32, rays_on_device=True)
    with pytest.raises(ValueError, match="matching resolution"):
        DeviceDataset(small, share_storage_from=train_ds)
    # row mismatch (opt-in split filtering changes the row list)
    filt = PackedSunRGBDLoader(pack_dir, split="val", compute_rays=True,
                               rays_on_device=True, split_filtering=True)
    if [s["row"] for s in filt.sample_paths] != list(train_ds.rows):
        with pytest.raises(ValueError, match="identical sample rows"):
            DeviceDataset(filt, share_storage_from=train_ds)


def test_chunked_thread_abandoned_consumer(pack_dir):
    """Leaving batches() early (break mid-epoch) must terminate and
    join the producer thread so a subsequent epoch on the same instance
    owns the staging slots exclusively (no stuck-producer writes
    corrupting the new epoch's uploads)."""
    import threading

    from cadepth_tpu.data import ChunkedDeviceDataset

    loader, ds = make_ds(pack_dir)
    ch = ChunkedDeviceDataset(loader, chunk_samples=5)
    want = [{k: np.asarray(v) for k, v in b.items()}
            for b in ds.batches(4, shuffle=True, seed=13, epoch=0,
                                augment=False)]
    n_before = threading.active_count()
    for trial in range(4):
        it = ch.batches(4, shuffle=True, seed=13, epoch=0, augment=False,
                        prefetch="thread")
        next(it)            # consume one batch, abandon the rest
        it.close()          # generator finally must stop + join producer
        got = list(ch.batches(4, shuffle=True, seed=13, epoch=0,
                              augment=False, prefetch="thread"))
        assert len(got) == len(want)
        for i, g in enumerate(got):
            for k in g:
                np.testing.assert_array_equal(
                    want[i][k], np.asarray(g[k]),
                    err_msg=f"trial {trial} batch {i} key {k}")
    # no leaked producer threads across the abandon/restart cycles
    assert threading.active_count() <= n_before + 1


def test_chunked_eval_batch_bigger_than_chunk(pack_dir, tmp_path):
    """Evaluator's device-resident chunked warm-up with eval batch_size
    > chunk_samples (regression: the direct _upload bypassed batches()'
    slot growth and crashed on the too-small staging slot)."""
    from cadepth_tpu.config import config_from_dict
    from cadepth_tpu.evaluation import EvaluationConfig, ModelEvaluator
    from cadepth_tpu.training import build_optimizer, create_train_state
    from cadepth_tpu.training.train_state import build_model_and_loss

    cfg = config_from_dict({
        "data": {"input_height": 48, "input_width": 64,
                 "compute_rays": True,
                 "device_resident_chunk_samples": 3},   # < batch_size
        "model": {"architecture": "baseline_unet", "init_features": 4},
    })
    loader = PackedSunRGBDLoader(pack_dir, split="test", compute_rays=True,
                                 rays_on_device=True)
    model, _ = build_model_and_loss(cfg)
    tx = build_optimizer(cfg.optimization, lambda s: 1e-4)
    batch = jax.device_put(loader.get_batch([0, 1]))
    state = create_train_state(cfg, model, tx, jax.random.PRNGKey(0), batch)
    ev = ModelEvaluator(cfg, model, state,
                        EvaluationConfig(warmup_iterations=1, batch_size=5))
    host = ev.evaluate(loader)
    dev = ev.evaluate(loader, device_resident=True)
    assert dev.num_samples == host.num_samples == len(loader)
    for a, b in zip(host.per_sample, dev.per_sample):
        for k in a:
            np.testing.assert_allclose(a[k], b[k], rtol=1e-6, atol=1e-7)


def test_chunked_thread_overlap_hides_upload(pack_dir, monkeypatch):
    """Thread-mode chunk prefetch OVERLAPS uploads with compute; serial
    mode alternates them (VERDICT r3 item 4: demonstrate the overlap,
    don't extrapolate it). The wire and the device step are simulated
    with GIL-releasing sleeps of known duration — exactly what a real
    DMA/device gives the host thread — so the assertion exercises the
    real scheduling machinery (double-buffered slots, token semaphore,
    producer thread) with controlled constants:

      serial epoch ~= n_chunks * (U + C_chunk)   [alternating]
      thread epoch ~= U + n_chunks * max(U, C_chunk) + tail [overlapped]

    and the measured serial fed fraction must match the
    ``serial_fed_fraction`` formula PERF_NOTES uses for the tunnel.
    """
    import time

    from cadepth_tpu.data import ChunkedDeviceDataset
    from cadepth_tpu.data.device_resident import serial_fed_fraction

    loader = PackedSunRGBDLoader(pack_dir, split="train", compute_rays=True,
                                 rays_on_device=True)
    ch = ChunkedDeviceDataset(loader, chunk_samples=4)
    n_chunks = len(ch) // 4          # 12 samples -> 3 chunks
    assert n_chunks == 3

    U = 0.12                         # simulated wire time per chunk
    C = 0.06                         # simulated device step per batch
    batches_per_chunk = 2            # batch_size=2 over chunk of 4

    uploads: list = []
    computes: list = []
    orig_upload = ChunkedDeviceDataset._upload

    def slow_upload(self, order_slice, slot=0, block=False):
        t0 = time.perf_counter()
        out = orig_upload(self, order_slice, slot=slot, block=block)
        time.sleep(U)                # the simulated wire (releases GIL)
        uploads.append((t0, time.perf_counter()))
        return out

    monkeypatch.setattr(ChunkedDeviceDataset, "_upload", slow_upload)

    def run_epoch(prefetch):
        uploads.clear()
        computes.clear()
        t0 = time.perf_counter()
        n = 0
        for _ in ch.batches(2, shuffle=False, seed=0, epoch=0,
                            augment=False, prefetch=prefetch):
            c0 = time.perf_counter()
            time.sleep(C)            # the simulated device step
            computes.append((c0, time.perf_counter()))
            n += 1
        return time.perf_counter() - t0, n

    # warm-up: compile the jitted gather + fence programs outside the
    # timed windows
    run_epoch("serial")

    serial_wall, n_serial = run_epoch("serial")
    thread_wall, n_thread = run_epoch("thread")
    thread_uploads = list(uploads)
    thread_computes = list(computes)
    assert n_serial == n_thread == n_chunks * batches_per_chunk

    # 1. direct overlap evidence: upload wall time hidden behind compute
    hidden = sum(max(0.0, min(ue, ce) - max(us, cs))
                 for us, ue in thread_uploads
                 for cs, ce in thread_computes)
    assert hidden > U, (
        f"thread mode hid only {hidden * 1e3:.0f} ms of upload behind "
        f"compute (expected > {U * 1e3:.0f} ms of the "
        f"{n_chunks * U * 1e3:.0f} ms total)")

    # 2. wall-clock shape: overlapped epoch is strictly cheaper than the
    # alternating one (ideal: 0.48 s vs 0.72 s here; generous margins
    # absorb the real staging/gather overhead on a loaded CI host)
    assert thread_wall < serial_wall - 0.5 * U, (
        f"thread {thread_wall:.3f}s vs serial {serial_wall:.3f}s")

    # 3. the serial fed-fraction formula, asserted with the simulated
    # constants: compute/(compute + bytes/wire) per sample
    compute_per_sample = C / 2.0
    upload_per_sample = U / 4.0
    predicted = serial_fed_fraction(compute_per_sample, upload_per_sample,
                                    1.0)  # upload already in seconds
    measured = (n_serial * C) / serial_wall
    assert abs(measured - predicted) < 0.17, (
        f"serial fed fraction: measured {measured:.2f} vs formula "
        f"{predicted:.2f}")
