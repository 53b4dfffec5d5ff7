"""End-to-end training: loop smoke, overfit sanity, checkpoint resume,
LR schedules. Runs on the CPU backend with a tiny model + synthetic data."""

from pathlib import Path

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from cadepth_tpu.config import config_from_dict
from cadepth_tpu.data import SunRGBDLoader, generate_synthetic_dataset
from cadepth_tpu.training import (
    Trainer,
    build_lr_schedule,
    build_optimizer,
    create_train_state,
    make_train_step,
    make_eval_step,
    CheckpointManager,
)
from cadepth_tpu.training.train_state import build_model_and_loss


@pytest.fixture(scope="module")
def dataset(tmp_path_factory):
    root = tmp_path_factory.mktemp("train_fixture")
    manifest = generate_synthetic_dataset(root, images_per_sensor=2)
    return str(root), manifest


def tiny_config(dataset, tmp_path, **overrides):
    root, manifest = dataset
    raw = {
        "experiment": {"name": "test_run"},
        "data": {
            "data_dir": f"{root}/sunrgbd",
            "manifest_path": manifest,
            "input_height": 32,
            "input_width": 32,
        },
        "model": {"architecture": "baseline_unet", "init_features": 4},
        "optimization": {"optimizer": "adam", "learning_rate": 1e-3,
                         "lr_scheduler": "none", "lr_warmup_epochs": 0},
        "training": {"num_epochs": 2, "batch_size": 4, "num_workers": 2,
                     "log_interval": 1, "num_vis_samples": 1},
        "checkpointing": {"checkpoint_dir": str(tmp_path / "ckpts"),
                          "save_interval": 1},
        "logging": {"log_dir": str(tmp_path / "logs"),
                    "tensorboard": {"enabled": False}},
        "early_stopping": {"enabled": False},
    }
    for key, value in overrides.items():
        raw.setdefault(key, {}).update(value)
    return config_from_dict(raw)


def test_lr_schedules():
    from cadepth_tpu.config import OptimizationConfig

    # step decay with warmup
    opt = OptimizationConfig(learning_rate=1e-2, lr_scheduler="step",
                             lr_step_size=2, lr_gamma=0.5, lr_warmup_epochs=1)
    sched = build_lr_schedule(opt, steps_per_epoch=10, num_epochs=10)
    assert float(sched(0)) == pytest.approx(0.0)
    assert float(sched(10)) == pytest.approx(1e-2, rel=1e-3)
    assert float(sched(25)) == pytest.approx(5e-3, rel=1e-3)
    assert float(sched(45)) == pytest.approx(2.5e-3, rel=1e-3)
    # cosine hits lr_min at the end
    opt2 = OptimizationConfig(learning_rate=1e-2, lr_scheduler="cosine",
                              lr_warmup_epochs=0, lr_min=1e-6)
    sched2 = build_lr_schedule(opt2, steps_per_epoch=10, num_epochs=10)
    assert float(sched2(0)) == pytest.approx(1e-2, rel=1e-3)
    assert float(sched2(100)) == pytest.approx(1e-6, rel=1e-2)


def test_optimizer_variants():
    from cadepth_tpu.config import OptimizationConfig

    for name in ("adam", "adamw", "sgd"):
        opt = OptimizationConfig(optimizer=name)
        tx = build_optimizer(opt, lambda step: 1e-4)
        params = {"w": jnp.ones((3,))}
        opt_state = tx.init(params)
        grads = {"w": jnp.ones((3,))}
        updates, _ = tx.update(grads, opt_state, params)
        assert np.isfinite(np.asarray(updates["w"])).all()
    with pytest.raises(ValueError):
        build_optimizer(OptimizationConfig(optimizer="lion"), lambda s: 1e-4)


def test_overfit_single_batch(dataset, tmp_path):
    """The reference sprint plan's intended-but-absent sanity check
    (documents/sprint_plan.md:415-440): loss must drop sharply when
    overfitting one batch."""
    cfg = tiny_config(dataset, tmp_path)
    model, loss_fn = build_model_and_loss(cfg)
    tx = build_optimizer(cfg.optimization, lambda s: 3e-3)
    root, manifest = dataset
    loader = SunRGBDLoader(f"{root}/sunrgbd", manifest,
                           target_height=32, target_width=32)
    batch = jax.device_put(loader.get_batch([0, 1]))
    state = create_train_state(cfg, model, tx, jax.random.PRNGKey(0), batch)
    step = make_train_step(cfg, model, loss_fn, tx, donate=False)
    first = None
    logs = {}
    for i in range(100):
        state, logs = step(state, batch)
        if first is None:
            first = float(logs["total_loss"])
    last = float(logs["total_loss"])
    assert last < first * 0.4, (first, last)
    assert np.isfinite(last)


def test_eval_step_outputs(dataset, tmp_path):
    cfg = tiny_config(dataset, tmp_path)
    model, loss_fn = build_model_and_loss(cfg)
    tx = build_optimizer(cfg.optimization, lambda s: 1e-3)
    root, manifest = dataset
    loader = SunRGBDLoader(f"{root}/sunrgbd", manifest,
                           target_height=32, target_width=32)
    batch = jax.device_put(loader.get_batch([0, 1]))
    state = create_train_state(cfg, model, tx, jax.random.PRNGKey(0), batch)
    out = make_eval_step(cfg, model, loss_fn)(state, batch)
    for key in ("total_loss", "si_loss", "abs_rel", "rmse", "delta_1.25"):
        assert key in out
        assert np.isfinite(float(out[key]))
    assert "pcl_max_rot" not in out  # baseline_unet has no PCL


def test_eval_step_reports_pcl_rotation(dataset, tmp_path):
    """Geometry models surface the max predicted PCL |rotation| so the
    two_pass default's sub-pixel displacement bound is monitorable; at
    identity init the rotations are exactly 0."""
    cfg = tiny_config(dataset, tmp_path,
                      model={"architecture": "geometry_aware_lightweight",
                             "init_features": 4})
    model, loss_fn = build_model_and_loss(cfg)
    tx = build_optimizer(cfg.optimization, lambda s: 1e-3)
    root, manifest = dataset
    loader = SunRGBDLoader(f"{root}/sunrgbd", manifest,
                           target_height=32, target_width=32)
    batch = jax.device_put(loader.get_batch([0, 1]))
    state = create_train_state(cfg, model, tx, jax.random.PRNGKey(0), batch)
    out = make_eval_step(cfg, model, loss_fn)(state, batch)
    assert float(out["pcl_max_rot"]) == 0.0


def test_trainer_end_to_end(dataset, tmp_path):
    cfg = tiny_config(dataset, tmp_path)
    trainer = Trainer(cfg)
    metrics = trainer.train()
    trainer.close()
    assert "abs_rel" in metrics
    # observability artifacts exist
    log_dir = tmp_path / "logs" / "test_run"
    assert (log_dir / "training.log").exists()
    csv = (log_dir / "metrics.csv").read_text().splitlines()
    assert csv[0].startswith("epoch,step,train_loss,val_loss,abs_rel")
    assert len(csv) == 3  # header + 2 epochs
    # checkpoints exist with retention structure
    ckpt_dir = tmp_path / "ckpts" / "test_run"
    assert any(ckpt_dir.glob("step_*"))


def test_trainer_geometry_aware_arch(dataset, tmp_path):
    cfg = tiny_config(dataset, tmp_path,
                      model={"architecture": "geometry_aware",
                             "init_features": 4})
    trainer = Trainer(cfg)
    loss = trainer.train_epoch(0)
    trainer.close()
    assert np.isfinite(loss)


def test_gradient_histograms_logged(dataset, tmp_path):
    """Per-parameter `gradients/<name>` histograms at the histogram
    interval (tag parity: tensorboard_trainer_enhanced.h:523-555) —
    one tag per weight tag, finite values, from a grad-only pass."""
    cfg = tiny_config(dataset, tmp_path,
                      logging={"tensorboard": {
                          "enabled": False, "log_histogram_interval": 1}})
    trainer = Trainer(cfg)
    recorded = []
    trainer.tb.add_histogram = lambda tag, values, step: recorded.append(
        (tag, np.asarray(values), step))
    trainer.train()
    trainer.close()
    grad_tags = sorted(t for t, _, _ in recorded
                       if t.startswith("gradients/"))
    weight_tags = sorted(t for t, _, _ in recorded
                         if t.startswith("weights/"))
    assert grad_tags and len(set(grad_tags)) == len(set(weight_tags))
    assert ({t.removeprefix("gradients/") for t in grad_tags}
            == {t.removeprefix("weights/") for t in weight_tags})
    for tag, values, _ in recorded:
        assert np.isfinite(values).all(), tag
    assert any(np.abs(v).max() > 0 for t, v, _ in recorded
               if t.startswith("gradients/"))


def test_checkpoint_roundtrip_and_resume(dataset, tmp_path):
    cfg = tiny_config(dataset, tmp_path)
    model, loss_fn = build_model_and_loss(cfg)
    tx = build_optimizer(cfg.optimization, lambda s: 1e-3)
    root, manifest = dataset
    loader = SunRGBDLoader(f"{root}/sunrgbd", manifest,
                           target_height=32, target_width=32)
    batch = jax.device_put(loader.get_batch([0, 1]))
    state = create_train_state(cfg, model, tx, jax.random.PRNGKey(0), batch)
    step = make_train_step(cfg, model, loss_fn, tx, donate=False)
    for _ in range(3):
        state, _ = step(state, batch)

    mgr = CheckpointManager(str(tmp_path / "ckpt_rt"), keep_last_n=2)
    path = mgr.save(state, epoch=0, metrics={"abs_rel": 0.5}, is_best=True)
    target = create_train_state(cfg, model, tx, jax.random.PRNGKey(1), batch)
    restored, meta = mgr.restore_with_meta(path, target)
    assert int(restored.step) == 3
    assert meta["metrics"]["abs_rel"] == 0.5
    a = jax.tree_util.tree_leaves(state.params)
    b = jax.tree_util.tree_leaves(restored.params)
    for x, y in zip(a, b):
        np.testing.assert_array_equal(np.asarray(x), np.asarray(y))
    assert mgr.best_dir.exists()


def test_checkpoint_retention(dataset, tmp_path):
    cfg = tiny_config(dataset, tmp_path)
    model, loss_fn = build_model_and_loss(cfg)
    tx = build_optimizer(cfg.optimization, lambda s: 1e-3)
    root, manifest = dataset
    loader = SunRGBDLoader(f"{root}/sunrgbd", manifest,
                           target_height=32, target_width=32)
    batch = jax.device_put(loader.get_batch([0]))
    state = create_train_state(cfg, model, tx, jax.random.PRNGKey(0), batch)
    step = make_train_step(cfg, model, loss_fn, tx, donate=False)
    mgr = CheckpointManager(str(tmp_path / "ckpt_keep"), keep_last_n=2)
    for epoch in range(4):
        state, _ = step(state, batch)
        mgr.save(state, epoch=epoch)
    kept = sorted(p.name for p in (tmp_path / "ckpt_keep").glob("step_*")
                  if p.is_dir())
    assert len(kept) == 2
    assert mgr.latest_checkpoint().endswith(kept[-1])


def test_trainer_resume_from_latest(dataset, tmp_path):
    cfg = tiny_config(dataset, tmp_path)
    t1 = Trainer(cfg)
    t1.train()
    t1.close()
    cfg2 = tiny_config(dataset, tmp_path)
    cfg2.checkpointing.resume_from = "latest"
    cfg2.training.num_epochs = 3
    t2 = Trainer(cfg2)
    assert t2.start_epoch == 2
    assert int(t2.state.step) > 0
    t2.close()


def test_trainer_spatial_parallel_mesh(dataset, tmp_path):
    """hardware.spatial_parallel builds a 2-D data x space mesh and
    trains one epoch with image-height sharding."""
    cfg = tiny_config(dataset, tmp_path,
                      hardware={"spatial_parallel": 2})
    trainer = Trainer(cfg)
    try:
        assert trainer.mesh is not None
        assert trainer.mesh.axis_names == ("data", "space")
        assert trainer.mesh.devices.shape == (4, 2)
        assert isinstance(trainer.data_sharding, dict)
        loss = trainer.train_epoch(0)
        assert np.isfinite(loss)
    finally:
        trainer.close()


def test_grad_accumulation_equivalence(dataset, tmp_path):
    """grad_accum_steps=2 fed the SAME batch twice must (a) leave params
    unchanged after the first micro-step and (b) land exactly where one
    accum=1 step lands (the averaged gradient equals the single-batch
    gradient), with the LR schedule advancing per effective update."""
    root, manifest = dataset
    loader = SunRGBDLoader(f"{root}/sunrgbd", manifest,
                           target_height=32, target_width=32)
    batch = jax.device_put(loader.get_batch([0, 1]))

    def build(accum):
        cfg = tiny_config(dataset, tmp_path,
                          optimization={"grad_accum_steps": accum,
                                        "gradient_clip": False})
        model, loss_fn = build_model_and_loss(cfg)
        tx = build_optimizer(cfg.optimization, lambda s: 1e-3)
        state = create_train_state(cfg, model, tx, jax.random.PRNGKey(0),
                                   batch)
        return state, make_train_step(cfg, model, loss_fn, tx, donate=False)

    state1, step1 = build(1)
    state2, step2 = build(2)
    p0 = jax.tree_util.tree_leaves(state2.params)[0]

    state1, _ = step1(state1, batch)
    state2, _ = step2(state2, batch)
    # first micro-step only accumulates
    np.testing.assert_array_equal(
        np.asarray(jax.tree_util.tree_leaves(state2.params)[0]),
        np.asarray(p0))
    state2, _ = step2(state2, batch)
    for a, b in zip(jax.tree_util.tree_leaves(state1.params),
                    jax.tree_util.tree_leaves(state2.params)):
        np.testing.assert_allclose(np.asarray(a, np.float32),
                                   np.asarray(b, np.float32),
                                   rtol=1e-5, atol=1e-6)


def test_preemption_checkpoint_and_resume(dataset, tmp_path):
    """SIGTERM mid-epoch: the trainer finishes the in-flight batch,
    saves a checkpoint, and exits; --resume latest continues from it."""
    import signal

    from cadepth_tpu.training.trainer import Trainer

    cfg = tiny_config(dataset, tmp_path,
                      training={"num_epochs": 3, "batch_size": 4})
    tr = Trainer(cfg)
    orig_step = tr.train_step
    calls = {"n": 0}

    def step(state, batch):
        calls["n"] += 1
        if calls["n"] == 2:  # preempt mid-epoch, after the 2nd batch
            signal.raise_signal(signal.SIGTERM)
        return orig_step(state, batch)

    tr.train_step = step
    tr.train()
    assert tr._preempted
    assert calls["n"] == 2  # loop stopped at the next batch boundary
    saved_step = int(tr.state.step)
    latest = tr.ckpt.latest_checkpoint()
    assert latest is not None
    installed = tr._orig_sigterm  # whatever disposition Trainer() replaced
    tr.close()
    # close() restores the original SIGTERM disposition
    assert signal.getsignal(signal.SIGTERM) == installed

    cfg2 = tiny_config(dataset, tmp_path,
                       training={"num_epochs": 3, "batch_size": 4},
                       checkpointing={
                           "checkpoint_dir": str(tmp_path / "ckpts"),
                           "save_interval": 1, "resume_from": "latest"})
    tr2 = Trainer(cfg2)
    assert int(tr2.state.step) == saved_step
    tr2.close()


def test_checkpoint_async_save(dataset, tmp_path):
    """blocking=False defers meta/best/retention to finalize(), which is
    also implied by the next save or any restore/lookup."""
    cfg = tiny_config(dataset, tmp_path)
    model, loss_fn = build_model_and_loss(cfg)
    tx = build_optimizer(cfg.optimization, lambda s: 1e-3)
    root, manifest = dataset
    loader = SunRGBDLoader(f"{root}/sunrgbd", manifest,
                           target_height=32, target_width=32)
    batch = jax.device_put(loader.get_batch([0, 1]))
    state = create_train_state(cfg, model, tx, jax.random.PRNGKey(0), batch)
    step = make_train_step(cfg, model, loss_fn, tx, donate=False)

    mgr = CheckpointManager(str(tmp_path / "ckpt_async"), keep_last_n=2)
    state, _ = step(state, batch)
    path1 = mgr.save(state, epoch=0, metrics={"abs_rel": 0.7},
                     is_best=True, blocking=False)
    # next async save implicitly finalizes the first
    state, _ = step(state, batch)
    mgr.save(state, epoch=1, metrics={"abs_rel": 0.6}, is_best=True,
             blocking=False)
    assert (tmp_path / "ckpt_async" / "step_00000001.meta.json").exists()
    # lookups finalize the in-flight save
    assert mgr.best_metric_value() == 0.6
    assert mgr.latest_checkpoint().endswith("step_00000002")
    target = create_train_state(cfg, model, tx, jax.random.PRNGKey(1), batch)
    restored, meta = mgr.restore_with_meta(mgr.latest_checkpoint(), target)
    assert int(restored.step) == 2
    assert meta["epoch"] == 1
    for x, y in zip(jax.tree_util.tree_leaves(state.params),
                    jax.tree_util.tree_leaves(restored.params)):
        np.testing.assert_array_equal(np.asarray(x), np.asarray(y))
    # path1 still exists under keep_last_n=2
    assert Path(path1).exists()
