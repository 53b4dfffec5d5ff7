"""Training orchestration: epochs, validation, logging, checkpoints.

Functional union of the reference's three trainers (SURVEY §2.8):
`ProductionTrainer` (CSV + log file + checkpoints),
`TensorBoardTrainerEnhanced` (batch scalars, grad norms, histograms,
image panels, hparams — the default path), and the generic
`DepthTrainer` skeleton (early stopping, best-metric selection, LR
schedule, resume — designed there but never wired; wired here).

TPU-first loop shape: the device step is one donated jit program
(:mod:`cadepth_tpu.training.train_state`), the host only orchestrates —
input prefetch runs ahead (:class:`cadepth_tpu.data.pipeline.InputPipeline`),
per-batch log scalars stay on device and only sync at log_interval.
"""

from __future__ import annotations

import time
from pathlib import Path
from typing import Dict, Optional

import jax
import jax.numpy as jnp
import numpy as np

from cadepth_tpu.config import Config
from cadepth_tpu.data.pipeline import InputPipeline
from cadepth_tpu.data.sunrgbd import AugmentationConfig, SunRGBDLoader
from cadepth_tpu.metrics.depth_metrics import MetricsAccumulator
from cadepth_tpu.models.factory import count_parameters
from cadepth_tpu.parallel.mesh import (make_mesh, make_mesh_2d, batch_sharding, batch_shardings, replicate_state)
from cadepth_tpu.training.checkpoint import CheckpointManager
from cadepth_tpu.training.schedule import build_lr_schedule
from cadepth_tpu.training.tb_logger import TensorBoardLogger
from cadepth_tpu.training.train_state import (
    build_model_and_loss,
    build_optimizer,
    create_train_state,
    make_eval_step,
    make_grad_fn,
    make_predict_fn,
    make_train_step,
)
from cadepth_tpu.utils.profiling import StepTimer
from cadepth_tpu.visualization.depth_viz import create_comparison

CSV_HEADER = ("epoch,step,train_loss,val_loss,"
              "abs_rel,sq_rel,rmse,rmse_log,a1,a2,a3,"
              "learning_rate,time_elapsed\n")  # tensorboard_trainer_enhanced.h:111-115


def build_loaders(cfg: Config):
    """Train/val loaders + augmentation wiring (train_main.cpp:370-404)."""
    aug = cfg.data.augmentation
    sensors = cfg.data.sensor_types or ["kv1", "kv2", "realsense", "xtion"]
    common = dict(
        target_height=cfg.data.input_height,
        target_width=cfg.data.input_width,
        allowed_sensors=sensors,
        split_filtering=cfg.data.split_filtering,
        compute_rays=cfg.data.compute_rays,
        # the jitted steps derive rays on device when compute_rays, so
        # host batches skip the grid (and its H2D transfer) entirely
        rays_on_device=cfg.data.compute_rays,
    )
    if cfg.data.packed_dir:
        from cadepth_tpu.data.packed import PackedSunRGBDLoader

        common["preload"] = cfg.data.packed_preload
        train_loader = PackedSunRGBDLoader(
            cfg.data.packed_dir, split=cfg.data.train_split, **common)
        val_loader = PackedSunRGBDLoader(
            cfg.data.packed_dir, split=cfg.data.val_split, **common)
    else:
        common.update(data_dir=cfg.data.data_dir,
                      manifest_path=cfg.data.manifest_path)
        train_loader = SunRGBDLoader(split=cfg.data.train_split, **common)
        val_loader = SunRGBDLoader(split=cfg.data.val_split, **common)
    train_loader.enable_augmentation(AugmentationConfig(
        enable_random_crop=aug.random_crop,
        crop_scale_min=aug.crop_scale_min,
        crop_scale_max=aug.crop_scale_max,
        enable_horizontal_flip=aug.horizontal_flip,
        horizontal_flip_prob=aug.flip_probability,
        enable_color_jitter=aug.color_jitter,
        brightness_delta=aug.brightness,
        contrast_delta=aug.contrast,
        random_seed=cfg.experiment.seed,
    ))
    return train_loader, val_loader


class Trainer:
    def __init__(self, cfg: Config, train_loader: Optional[SunRGBDLoader] = None,
                 val_loader: Optional[SunRGBDLoader] = None):
        self.cfg = cfg
        if train_loader is None or val_loader is None:
            train_loader, val_loader = build_loaders(cfg)
        self.train_loader = train_loader
        self.val_loader = val_loader

        # -- device mesh / sharding
        self.mesh = None
        self.data_sharding = None
        if cfg.hardware.data_parallel and len(jax.devices()) > 1:
            n = cfg.hardware.num_devices or len(jax.devices())
            n = min(n, len(jax.devices()))
            if cfg.hardware.num_devices and cfg.training.batch_size % n != 0:
                raise ValueError(
                    f"batch_size {cfg.training.batch_size} is not divisible by "
                    f"hardware.num_devices {n}")
            spatial = max(cfg.hardware.spatial_parallel, 1)
            if spatial > 1:
                # 2-D data x space mesh: batch over data, image height
                # over space (conv halos inserted by the partitioner)
                n -= n % spatial
                while n >= spatial and \
                        cfg.training.batch_size % (n // spatial) != 0:
                    n -= spatial
                if n >= spatial and cfg.data.input_height % spatial == 0:
                    self.mesh = make_mesh_2d(n, spatial)
                    self.data_sharding = batch_shardings(self.mesh)
            else:
                # auto mode: largest device count that divides the global batch
                while cfg.training.batch_size % n != 0:
                    n -= 1
                if n > 1:
                    self.mesh = make_mesh(n, cfg.hardware.mesh_axis)
                    self.data_sharding = batch_sharding(
                        self.mesh, cfg.hardware.mesh_axis)

        # -- pipelines
        debug_limits = getattr(cfg, "_debug_limits", None) or {}
        if cfg.data.device_resident:
            self._build_device_pipes(debug_limits)
        else:
            self._build_host_pipes(debug_limits)
        self._finish_init()

    def _build_device_pipes(self, debug_limits) -> None:
        """HBM-resident dataset + jitted batching (data.device_resident).

        Requires a pack at the target resolution; the train/val splits
        share one upload when their filtered rows coincide (the default
        non-filtering quirk makes them identical)."""
        import jax.numpy as jnp

        from cadepth_tpu.data.device_resident import (
            ChunkedDeviceDataset,
            DeviceDataset,
            DevicePipeline,
        )
        from cadepth_tpu.data.packed import PackedSunRGBDLoader

        cfg = self.cfg
        if not isinstance(self.train_loader, PackedSunRGBDLoader):
            raise ValueError(
                "data.device_resident needs data.packed_dir (build one "
                "with cli/pack_dataset.py)")
        # "quantized" = the dataset's native encodings (rgb uint8, depth
        # uint16 millimeters): 3.2x less HBM/H2D than fp32, and depth
        # stores its exact mm value for mm-sourced packs (SUN RGB-D depth
        # PNGs are mm; fp32 materialization within 1 ulp of the host /1000)
        # — unlike bfloat16, which is why bf16 storage never applied to GT.
        if cfg.data.device_resident_dtype == "quantized":
            dtype, depth_dtype = jnp.uint8, jnp.uint16
        else:
            dtype = (jnp.bfloat16
                     if cfg.data.device_resident_dtype == "bfloat16"
                     else jnp.float32)
            depth_dtype = jnp.float32
        chunk = cfg.data.device_resident_chunk_samples
        if chunk > 0:
            # pack bigger than HBM: rotate it through two chunk buffers
            # (same epoch semantics as fully-resident, see the class)
            if self.mesh is not None:
                raise ValueError(
                    "device_resident_chunk_samples is the single-device "
                    "capacity mode; on a mesh use the sharded resident "
                    "dataset instead (it splits the pack across chips)")
            ds_kw = dict(rgb_dtype=dtype, depth_dtype=depth_dtype)
            train_ds = ChunkedDeviceDataset(self.train_loader, chunk, **ds_kw)
            val_ds = ChunkedDeviceDataset(self.val_loader, chunk, **ds_kw)
            self.train_pipe = DevicePipeline(
                train_ds, cfg.training.batch_size, shuffle=True,
                seed=cfg.experiment.seed,
                max_samples=debug_limits.get("num_train_samples"))
            self.val_pipe = DevicePipeline(
                val_ds, cfg.training.batch_size, shuffle=False,
                seed=cfg.experiment.seed,
                max_samples=debug_limits.get(
                    "num_val_samples", cfg.training.max_val_samples))
            return
        # Under a mesh the dataset itself is sharded along the data axis
        # (each chip holds len/n samples and gathers locally); otherwise
        # one device holds everything. bfloat16 storage applies to RGB
        # only — ground-truth depth keeps fp32 (8-bit-mantissa GT would
        # skew the losses/metrics it feeds).
        ds_kw = dict(rgb_dtype=dtype, depth_dtype=depth_dtype,
                     mesh=self.mesh,
                     sharding=None if self.mesh is not None
                     else self.data_sharding)
        if self.mesh is not None:
            ds_kw["mesh_axis"] = self.mesh.axis_names[0]
        train_ds = DeviceDataset(self.train_loader, **ds_kw)
        if [s["row"] for s in self.val_loader.sample_paths] == list(train_ds.rows):
            # one HBM upload serves both splits; the explicit constructor
            # keeps split/augmentation identity per-instance (no aliasing)
            val_ds = DeviceDataset(self.val_loader,
                                   share_storage_from=train_ds)
        else:
            val_ds = DeviceDataset(self.val_loader, **ds_kw)
        self.train_pipe = DevicePipeline(
            train_ds, cfg.training.batch_size, shuffle=True,
            seed=cfg.experiment.seed,
            max_samples=debug_limits.get("num_train_samples"))
        self.val_pipe = DevicePipeline(
            val_ds, cfg.training.batch_size, shuffle=False,
            seed=cfg.experiment.seed,
            max_samples=debug_limits.get(
                "num_val_samples", cfg.training.max_val_samples))

    def _build_host_pipes(self, debug_limits) -> None:
        cfg = self.cfg
        self.train_pipe = InputPipeline(
            self.train_loader, cfg.training.batch_size, shuffle=True,
            seed=cfg.experiment.seed, num_threads=max(cfg.training.num_workers, 1),
            prefetch_depth=cfg.training.prefetch_factor,
            sharding=self.data_sharding,
            max_samples=debug_limits.get("num_train_samples"),
            use_native=cfg.data.use_native_loader)
        # Validation capped at max_val_samples (production_trainer.h:242-281).
        # drop_remainder keeps eval batch shapes static (single compile, and
        # DP shards stay divisible); up to batch_size-1 tail samples are
        # skipped per pass, vs the reference's batch-1 full sweep.
        self.val_pipe = InputPipeline(
            self.val_loader, cfg.training.batch_size, shuffle=False,
            seed=cfg.experiment.seed, num_threads=max(cfg.training.num_workers, 1),
            prefetch_depth=cfg.training.prefetch_factor,
            sharding=self.data_sharding,
            max_samples=debug_limits.get(
                "num_val_samples", cfg.training.max_val_samples),
            use_native=cfg.data.use_native_loader)

    def _finish_init(self) -> None:
        cfg = self.cfg
        # -- model / optimizer / steps
        self.model, self.loss_fn = build_model_and_loss(cfg)
        # With grad accumulation the schedule advances only on effective
        # updates (optax.MultiSteps), so express epochs in update counts.
        accum = max(cfg.optimization.grad_accum_steps, 1)
        steps_per_epoch = max(len(self.train_pipe) // accum, 1)
        self.lr_schedule = build_lr_schedule(
            cfg.optimization, steps_per_epoch, cfg.training.num_epochs)
        self.tx = build_optimizer(cfg.optimization, self.lr_schedule)
        self.train_step = make_train_step(cfg, self.model, self.loss_fn, self.tx)
        self.eval_step = make_eval_step(cfg, self.model, self.loss_fn)
        self.predict_fn = make_predict_fn(cfg, self.model)
        # built lazily: compiles only if histogram logging ever fires
        self._grad_fn = None
        self._last_train_batch = None

        # -- state
        sample_batch = jax.device_put(self.train_loader.get_batch(
            range(min(2, len(self.train_loader)))))
        self.state = create_train_state(
            cfg, self.model, self.tx, jax.random.PRNGKey(cfg.experiment.seed),
            sample_batch)
        if self.mesh is not None:
            self.state = replicate_state(self.state, self.mesh)
        self.num_params = count_parameters(self.state.params)

        # -- observability
        log_dir = Path(cfg.logging.log_dir) / cfg.experiment.name
        log_dir.mkdir(parents=True, exist_ok=True)
        self.log_dir = log_dir
        self.tb = TensorBoardLogger(str(log_dir / "tensorboard"),
                                    enabled=cfg.logging.tensorboard_enabled)
        self._train_log = open(log_dir / "training.log", "a")
        self._csv = None
        if cfg.logging.csv_enabled:
            self._csv = open(log_dir / cfg.logging.metrics_file, "a")
            if self._csv.tell() == 0:
                self._csv.write(CSV_HEADER)

        # -- checkpointing / early stopping
        self.ckpt = CheckpointManager(
            str(Path(cfg.checkpointing.checkpoint_dir) / cfg.experiment.name),
            keep_last_n=cfg.checkpointing.keep_last_n,
            metric_name=cfg.validation.primary_metric,
            metric_lower_is_better=cfg.validation.metric_mode == "min")
        self.start_epoch = 0
        self.best_metric = float("inf") if cfg.validation.metric_mode == "min" \
            else float("-inf")
        self.epochs_without_improvement = 0
        self.history: list = []
        # When set, train() wraps the FIRST epoch in a jax.profiler trace —
        # profiled runs take the same optimizer/LR trajectory as unprofiled
        # ones (no separate throwaway epoch).
        self.profile_dir: Optional[str] = None

        # -- preemption safety: on SIGTERM (the preemption signal on
        # cloud TPU-VMs) finish the in-flight batch, checkpoint, and
        # exit cleanly so --resume latest continues where it stopped.
        # (The reference has no notion of this; torch::save only runs on
        # its schedule.)
        self._preempted = False
        self._orig_sigterm = None
        if cfg.checkpointing.save_on_preemption:
            import signal
            import threading

            def _on_sigterm(signum, frame):
                self._preempted = True
                self.log("SIGTERM received; checkpointing at the next "
                         "batch boundary")

            if threading.current_thread() is threading.main_thread():
                self._orig_sigterm = signal.signal(signal.SIGTERM,
                                                   _on_sigterm)

        resume_from = cfg.checkpointing.resume_from
        if resume_from:
            path = resume_from if resume_from != "latest" \
                else self.ckpt.latest_checkpoint()
            if path:
                self.state, meta = self.ckpt.restore_with_meta(path, self.state)
                self.start_epoch = int(meta.get("epoch", 0)) + 1
                metrics = meta.get("metrics", {})
                # Seed best_metric from BOTH the resumed checkpoint and the
                # stored best/ checkpoint: resuming from 'latest' (which may
                # be worse than best/) must not let a mediocre later epoch
                # overwrite the true best model.
                candidates = []
                if self.cfg.validation.primary_metric in metrics:
                    candidates.append(
                        float(metrics[self.cfg.validation.primary_metric]))
                stored_best = self.ckpt.best_metric_value()
                if stored_best is not None:
                    candidates.append(stored_best)
                if candidates:
                    pick = min if cfg.validation.metric_mode == "min" else max
                    self.best_metric = pick(candidates)
                self.log(f"Resumed from {path} at epoch {self.start_epoch}")

    # -- logging helpers ------------------------------------------------------

    def log(self, message: str) -> None:
        stamp = time.strftime("%Y-%m-%d %H:%M:%S")
        line = f"[{stamp}] {message}"
        if self.cfg.logging.verbose:
            print(line, flush=True)
        self._train_log.write(line + "\n")
        self._train_log.flush()

    def _is_improvement(self, value: float) -> bool:
        delta = self.cfg.early_stopping.min_delta
        if self.cfg.validation.metric_mode == "min":
            return value < self.best_metric - delta
        return value > self.best_metric + delta

    # -- loops ------------------------------------------------------------

    def train_epoch(self, epoch: int) -> float:
        cfg = self.cfg
        log_interval = max(cfg.training.log_interval, 1)
        losses = []
        last_logs = None
        timer = StepTimer()
        for batch_idx, batch in enumerate(self.train_pipe):
            if self._preempted:
                break
            self.state, logs = self.train_step(self.state, batch)
            if self.cfg.logging.log_histogram_interval:
                # retained ONLY when gradient histograms will consume it
                # (_log_gradient_histograms) — pinning a full batch in
                # device memory is real HBM on capacity-bound configs
                self._last_train_batch = batch
            timer.step(cfg.training.batch_size)
            losses.append(logs["total_loss"])
            last_logs = logs
            if batch_idx % log_interval == 0:
                step = int(self.state.step)
                self.tb.add_scalar("batch_loss/train",
                                   float(logs["total_loss"]), step)
                self.tb.add_scalar("training/gradient_norm",
                                   float(logs["grad_norm"]), step)
                # gradients/{norm,max,min} tag parity
                # (tensorboard_trainer_enhanced.h:523-555)
                self.tb.add_scalar("gradients/norm",
                                   float(logs["grad_norm"]), step)
                self.tb.add_scalar("gradients/max",
                                   float(logs["grad_max"]), step)
                self.tb.add_scalar("gradients/min",
                                   float(logs["grad_min"]), step)
        if not losses:
            return 0.0
        if timer.steps > 0:
            self.tb.add_scalar("training/images_per_sec",
                               timer.rate(self.state.params), epoch)
        mean_loss = float(jnp.mean(jnp.stack(losses)))
        if last_logs is not None:
            step = int(self.state.step)
            for key in ("si_loss", "grad_loss", "smooth_loss", "reproj_loss"):
                if key in last_logs:
                    self.tb.add_scalar(
                        f"loss_components/{key.removesuffix('_loss')}",
                        float(last_logs[key]), step)
        return mean_loss

    def validate(self, epoch: int) -> Dict[str, float]:
        acc = MetricsAccumulator()
        for batch in self.val_pipe:
            out = self.eval_step(self.state, batch)
            acc.update({k: float(v) for k, v in out.items()})
        metrics = acc.average()
        return metrics

    def visualize(self, epoch: int) -> None:
        """Log [RGB | GT | Pred | Error] panels (tensorboard_trainer_enhanced.h:444-470)."""
        n = min(self.cfg.training.num_vis_samples, len(self.val_loader))
        if n == 0 or not self.cfg.training.save_predictions:
            return
        batch = self.val_loader.get_batch(range(n))
        if self.mesh is not None:
            # vis batch size need not divide the mesh — replicate it
            from cadepth_tpu.parallel.mesh import replicate_sharding

            batch = jax.device_put(batch, replicate_sharding(self.mesh))
        else:
            batch = jax.device_put(batch)
        pred = np.asarray(self.predict_fn(self.state, batch))
        rgb = np.asarray(batch["rgb"])
        gt = np.asarray(batch["depth"])
        for i in range(n):
            panel = create_comparison(rgb[i], gt[i], pred[i])
            self.tb.add_image(f"predictions/sample_{i}", panel, epoch)

    def log_weight_histograms(self, epoch: int) -> None:
        flat = jax.tree_util.tree_leaves_with_path(self.state.params)
        for path, leaf in flat:
            name = "/".join(str(getattr(p, "key", p)) for p in path)
            self.tb.add_histogram(f"weights/{name}", np.asarray(leaf), epoch)

    def log_gradient_histograms(self, epoch: int) -> None:
        """Per-parameter `gradients/<name>` histograms
        (`tensorboard_trainer_enhanced.h:523-555`), computed by a
        dedicated grad-only program on the epoch's last train batch —
        the hot step never ships the grad pytree to the host."""
        if self._last_train_batch is None:
            return
        if self._grad_fn is None:
            self._grad_fn = make_grad_fn(self.cfg, self.model, self.loss_fn)
        grads = self._grad_fn(self.state, self._last_train_batch)
        for path, leaf in jax.tree_util.tree_leaves_with_path(grads):
            name = "/".join(str(getattr(p, "key", p)) for p in path)
            self.tb.add_histogram(f"gradients/{name}", np.asarray(leaf),
                                  epoch)

    def train(self) -> Dict[str, float]:
        cfg = self.cfg
        self.log("=" * 55)
        self.log(f"cadepth_tpu trainer — experiment '{cfg.experiment.name}'")
        self.log(f"model={cfg.model.architecture} params={self.num_params:,}")
        self.log(f"devices={len(jax.devices())} mesh={'on' if self.mesh else 'off'}"
                 f" batch={cfg.training.batch_size}")
        self.log(f"train_samples={len(self.train_loader)} "
                 f"val_samples={len(self.val_loader)}")
        self.log("=" * 55)
        self.tb.add_custom_scalars_layout()
        self.tb.add_text("model/architecture",
                         f"{cfg.model.architecture} ({self.num_params:,} params)")
        self.tb.add_hparams({
            "architecture": cfg.model.architecture,
            "init_features": cfg.model.init_features,
            "batch_size": cfg.training.batch_size,
            "learning_rate": cfg.optimization.learning_rate,
            "optimizer": cfg.optimization.optimizer,
            "lr_scheduler": cfg.optimization.lr_scheduler,
        })

        t0 = time.time()
        final_metrics: Dict[str, float] = {}
        for epoch in range(self.start_epoch, cfg.training.num_epochs):
            epoch_start = time.time()
            if self.profile_dir and epoch == self.start_epoch:
                from cadepth_tpu.utils import profile_trace

                with profile_trace(self.profile_dir):
                    train_loss = self.train_epoch(epoch)
                self.log(f"Profile trace written to {self.profile_dir}")
            else:
                train_loss = self.train_epoch(epoch)
            if self._preempted:
                self.ckpt.save(self.state, epoch, {}, is_best=False,
                               blocking=True)
                self.log(f"Preempted during epoch {epoch + 1}; checkpoint "
                         f"saved at step {int(self.state.step)} — resume "
                         "with --resume latest")
                final_metrics = final_metrics or {}
                break
            epoch_time = time.time() - epoch_start
            step = int(self.state.step)
            # state.step counts micro-steps; the schedule is indexed by
            # effective optimizer updates (see build_optimizer MultiSteps)
            lr = float(self.lr_schedule(
                step // max(self.cfg.optimization.grad_accum_steps, 1)))

            self.tb.add_scalar("loss/train", train_loss, epoch)
            self.tb.add_scalar("training/learning_rate", lr, epoch)
            self.tb.add_scalar("training/epoch_time_seconds", epoch_time, epoch)
            self.tb.add_scalar("training/total_time_seconds",
                               time.time() - t0, epoch)

            val_metrics: Dict[str, float] = {}
            if (epoch + 1) % max(cfg.training.val_interval, 1) == 0:
                val_metrics = self.validate(epoch)
                final_metrics = val_metrics
                self.tb.add_scalar("loss/val",
                                   val_metrics.get("total_loss", 0.0), epoch)
                for name in ("abs_rel", "sq_rel", "rmse", "rmse_log"):
                    self.tb.add_scalar(f"metrics/{name}",
                                       val_metrics.get(name, 0.0), epoch)
                self.tb.add_scalar("metrics/a1",
                                   val_metrics.get("delta_1.25", 0.0), epoch)
                self.tb.add_scalar("metrics/a2",
                                   val_metrics.get("delta_1.25^2", 0.0), epoch)
                self.tb.add_scalar("metrics/a3",
                                   val_metrics.get("delta_1.25^3", 0.0), epoch)
                if "pcl_max_rot" in val_metrics:
                    # live check of the two_pass warp's sub-pixel bound
                    rot = val_metrics["pcl_max_rot"]
                    self.tb.add_scalar("training/pcl_max_rot", rot, epoch)
                    # greppable in training.log so quality runs carry
                    # the observed rotation alongside their metrics
                    self.log(f"pcl_max_rot: {rot:.5f}")
                    # GEMM warps are exact only while |rot| stays small
                    # (<= |tan rot| px kernel displacement; separable
                    # silently DROPS rotation). Surface leaving the
                    # validated regime loudly, not just as a TB scalar.
                    from cadepth_tpu.models.pcl import DEFAULT_ROT_BOUND
                    if cfg.model.pcl_warp in ("two_pass", "separable",
                                              "pallas", "fused") \
                            and rot > 0.8 * DEFAULT_ROT_BOUND:
                        self.log(
                            f"WARNING: pcl_max_rot={rot:.4f} approaches "
                            f"the {cfg.model.pcl_warp} warp's validated "
                            f"rotation bound ({DEFAULT_ROT_BOUND}); the "
                            "warp kernel displacement may exceed a pixel "
                            "— consider model.pcl_warp: auto (exact "
                            "gather fallback) for this workload")
                self.visualize(epoch)

            if cfg.logging.log_histogram_interval and \
                    (epoch + 1) % cfg.logging.log_histogram_interval == 0:
                self.log_weight_histograms(epoch)
                self.log_gradient_histograms(epoch)

            if self._csv is not None:
                self._csv.write(
                    f"{epoch},{step},{train_loss:.6f},"
                    f"{val_metrics.get('total_loss', 0.0):.6f},"
                    f"{val_metrics.get('abs_rel', 0.0):.6f},"
                    f"{val_metrics.get('sq_rel', 0.0):.6f},"
                    f"{val_metrics.get('rmse', 0.0):.6f},"
                    f"{val_metrics.get('rmse_log', 0.0):.6f},"
                    f"{val_metrics.get('delta_1.25', 0.0):.6f},"
                    f"{val_metrics.get('delta_1.25^2', 0.0):.6f},"
                    f"{val_metrics.get('delta_1.25^3', 0.0):.6f},"
                    f"{lr:.8f},{time.time() - t0:.1f}\n")
                self._csv.flush()

            primary = val_metrics.get(cfg.validation.primary_metric)
            is_best = primary is not None and self._is_improvement(primary)
            if is_best:
                self.best_metric = primary
                self.epochs_without_improvement = 0
            elif primary is not None:
                self.epochs_without_improvement += 1

            # save_best_only skips the periodic saves (train_config.yaml:140);
            # best and final-epoch checkpoints are always written.
            periodic = (not cfg.checkpointing.save_best_only
                        and (epoch + 1) % max(cfg.checkpointing.save_interval, 1) == 0)
            is_last = epoch == cfg.training.num_epochs - 1
            if periodic or is_best or (is_last and cfg.checkpointing.save_last):
                self.ckpt.save(self.state, epoch, val_metrics, is_best=is_best,
                               blocking=not cfg.checkpointing.async_save)

            msg = (f"epoch {epoch + 1}/{cfg.training.num_epochs} "
                   f"loss={train_loss:.4f} lr={lr:.2e} time={epoch_time:.1f}s")
            if val_metrics:
                msg += (f" val_abs_rel={val_metrics.get('abs_rel', 0):.4f}"
                        f" val_rmse={val_metrics.get('rmse', 0):.4f}")
            self.log(msg)
            self.history.append({"epoch": epoch, "train_loss": train_loss,
                                 **val_metrics})

            if cfg.early_stopping.enabled and \
                    self.epochs_without_improvement >= cfg.early_stopping.patience:
                self.log(f"Early stopping at epoch {epoch + 1} "
                         f"(no improvement for "
                         f"{self.epochs_without_improvement} epochs)")
                break

        self.ckpt.finalize()  # land any in-flight async save
        self.log(f"Training complete in {time.time() - t0:.1f}s; "
                 f"best {cfg.validation.primary_metric}={self.best_metric:.4f}")
        self.tb.flush()
        return final_metrics

    def close(self) -> None:
        if self._orig_sigterm is not None:
            import signal

            signal.signal(signal.SIGTERM, self._orig_sigterm)
            self._orig_sigterm = None
        self.tb.close()
        self._train_log.close()
        if self._csv is not None:
            self._csv.close()
