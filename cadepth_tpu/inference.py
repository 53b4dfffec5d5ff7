"""Production inference: AOT-compiled fixed-shape depth predictor.

Serving-path layer beyond the reference's surface (its evaluator only
does offline batch evaluation, `evaluator.h:142-226`). TPU-native
serving wants: one compilation at fixed shapes (no retrace jitter),
device-resident parameters, padded micro-batching for ragged request
sizes, and honest latency accounting with a device fence.

    predictor = Predictor.from_checkpoint(cfg, "best", batch_size=8)
    depth = predictor.predict(rgb_batch, intrinsics)   # numpy in/out
    stats = predictor.benchmark()                       # p50/p95/p99
"""

from __future__ import annotations

import time
from typing import Dict, Optional

import jax
import jax.numpy as jnp
import numpy as np

from cadepth_tpu.config import Config
from cadepth_tpu.training.train_state import (
    build_model_and_loss,
    build_optimizer,
    create_train_state,
    make_predict_fn,
)


def load_exported(path: str):
    """Rehydrate a :meth:`Predictor.export_stablehlo` artifact.

    Returns a callable ``fn(batch_dict) -> depth`` that executes the
    serialized StableHLO program (parameters are baked-in constants);
    the batch dict must match the exported shapes exactly.
    """
    from jax import export as jexport

    with open(path, "rb") as f:
        exported = jexport.deserialize(f.read())
    return lambda batch: exported.call(batch)


def _default_k4(batch: int, height: int, width: int) -> np.ndarray:
    """Centered pinhole with f = width (cli/infer.py convention)."""
    k4 = np.empty((batch, 4), np.float32)
    k4[:, 0] = width
    k4[:, 1] = width
    k4[:, 2] = width / 2.0
    k4[:, 3] = height / 2.0
    return k4


class Predictor:
    """Fixed-shape, ahead-of-time-compiled depth predictor.

    All calls run the same compiled executable: inputs with fewer than
    ``batch_size`` samples are zero-padded to the compiled batch and
    the padding rows are dropped from the output.
    """

    def __init__(self, cfg: Config, state, batch_size: int = 1,
                 height: Optional[int] = None, width: Optional[int] = None):
        self.cfg = cfg
        self.batch_size = batch_size
        self.height = height or cfg.data.input_height
        self.width = width or cfg.data.input_width
        self.architecture = cfg.model.architecture
        self.state = state

        self._predict = make_predict_fn(cfg, build_model_and_loss(cfg)[0])
        # When compute_rays is on, the predict program derives the ray
        # grid on device from K — the request then carries no rays at
        # all (a third less host work + transfer per call).
        self._derive_rays = bool(cfg.data.compute_rays)
        self._shapes = {
            "rgb": jax.ShapeDtypeStruct(
                (batch_size, self.height, self.width, 3), jnp.float32),
            "intrinsics": jax.ShapeDtypeStruct((batch_size, 3, 3),
                                               jnp.float32),
            "k4": jax.ShapeDtypeStruct((batch_size, 4), jnp.float32),
        }
        if not self._derive_rays:
            self._shapes["rays"] = jax.ShapeDtypeStruct(
                (batch_size, self.height, self.width, 3), jnp.float32)
        # AOT: trace + lower + compile ONCE at construction; predict()
        # never retraces (no shape-dependent jitter in serving).
        self._compiled = self._predict.lower(state, self._shapes).compile()

    # -- constructors -------------------------------------------------------

    @classmethod
    def from_checkpoint(cls, cfg: Config, checkpoint: str = "best",
                        batch_size: int = 1,
                        height: Optional[int] = None,
                        width: Optional[int] = None) -> "Predictor":
        """Restore a trained checkpoint ('best', 'latest', or a path)."""
        from pathlib import Path

        from cadepth_tpu.training.checkpoint import CheckpointManager
        from cadepth_tpu.training.schedule import build_lr_schedule

        model, _ = build_model_and_loss(cfg)
        tx = build_optimizer(cfg.optimization,
                             build_lr_schedule(cfg.optimization, 1, 1))
        h = height or cfg.data.input_height
        w = width or cfg.data.input_width
        sample = {
            "rgb": np.zeros((1, h, w, 3), np.float32),
            "rays": np.zeros((1, h, w, 3), np.float32),
            "intrinsics": np.eye(3, dtype=np.float32)[None],
            "k4": _default_k4(1, h, w),
        }
        state = create_train_state(cfg, model, tx, jax.random.PRNGKey(0),
                                   jax.device_put(sample))
        root = Path(cfg.checkpointing.checkpoint_dir) / cfg.experiment.name
        mgr = CheckpointManager(str(root))
        if checkpoint == "best":
            path = str(mgr.best_dir)
        elif checkpoint == "latest":
            path = mgr.latest_checkpoint()
            if path is None:
                raise FileNotFoundError(f"no checkpoints under {root}")
        else:
            path = checkpoint
        state = mgr.restore(path, state)
        return cls(cfg, state, batch_size=batch_size, height=h, width=w)

    # -- serving ------------------------------------------------------------

    def _make_batch(self, rgb: np.ndarray,
                    intrinsics: Optional[np.ndarray]) -> Dict[str, jax.Array]:
        n, h, w = rgb.shape[0], self.height, self.width
        if rgb.shape[1:3] != (h, w):
            raise ValueError(
                f"Predictor compiled for {h}x{w}, got {rgb.shape[1:3]}; "
                "resize on the client or build another Predictor")
        if n > self.batch_size:
            raise ValueError(f"got {n} samples > batch_size {self.batch_size}")
        pad = self.batch_size - n
        rgb_full = np.zeros((self.batch_size, h, w, 3), np.float32)
        rgb_full[:n] = rgb
        if intrinsics is None:
            k = np.tile(np.eye(3, dtype=np.float32),
                        (self.batch_size, 1, 1))
            k4 = _default_k4(self.batch_size, h, w)
            k[:, 0, 0], k[:, 1, 1] = k4[:, 0], k4[:, 1]
            k[:, 0, 2], k[:, 1, 2] = k4[:, 2], k4[:, 3]
        else:
            k = np.tile(np.eye(3, dtype=np.float32), (self.batch_size, 1, 1))
            k[:n] = intrinsics
            if pad:
                k[n:] = intrinsics[-1]
            k4 = np.stack([k[:, 0, 0], k[:, 1, 1], k[:, 0, 2], k[:, 1, 2]],
                          -1).astype(np.float32)
        batch = {"rgb": rgb_full, "intrinsics": k.astype(np.float32),
                 "k4": k4}
        if not self._derive_rays:
            from cadepth_tpu.data.sunrgbd import SunRGBDLoader

            batch["rays"] = np.stack(
                [SunRGBDLoader._compute_rays(k[i], h, w)
                 for i in range(self.batch_size)]).astype(np.float32)
        return jax.device_put(batch)

    def predict(self, rgb: np.ndarray,
                intrinsics: Optional[np.ndarray] = None) -> np.ndarray:
        """rgb (N, H, W, 3) float [0,1], optional K (N, 3, 3) ->
        depth (N, H, W, 1) meters.

        ``rgb`` may also be a device-resident ``jax.Array`` already at
        the compiled (batch, H, W, 3) shape (with ``intrinsics`` a
        device (batch, 3, 3)); then no host staging or H2D happens at
        all — the path for callers whose frames are already on device.
        """
        if isinstance(rgb, jax.Array) and not isinstance(rgb, np.ndarray):
            out = self._compiled(self.state,
                                 self._device_batch(rgb, intrinsics))
            return np.asarray(out)
        rgb = np.asarray(rgb, np.float32)
        if rgb.ndim == 3:
            rgb = rgb[None]
        n = rgb.shape[0]
        out = self._compiled(self.state, self._make_batch(rgb, intrinsics))
        return np.asarray(out)[:n]

    def _device_batch(self, rgb, intrinsics) -> Dict[str, jax.Array]:
        want = self._shapes["rgb"].shape
        want_dt = self._shapes["rgb"].dtype
        if tuple(rgb.shape) != want:
            raise ValueError(f"device input must be the compiled shape "
                             f"{want}, got {tuple(rgb.shape)}")
        if rgb.dtype != want_dt:
            # the AOT executable was compiled for fixed avals; a near-miss
            # dtype would die inside it with an opaque argument error
            raise ValueError(f"device input must be the compiled dtype "
                             f"{want_dt}, got {rgb.dtype}")
        if intrinsics is not None:
            if tuple(intrinsics.shape) != (want[0], 3, 3):
                raise ValueError(
                    f"device intrinsics must be ({want[0]}, 3, 3), got "
                    f"{tuple(intrinsics.shape)}")
            if intrinsics.dtype != jnp.float32:
                raise ValueError(f"device intrinsics must be float32, "
                                 f"got {intrinsics.dtype}")
        if intrinsics is None:
            if not hasattr(self, "_default_k_dev"):
                k4 = _default_k4(self.batch_size, self.height, self.width)
                k = np.tile(np.eye(3, dtype=np.float32),
                            (self.batch_size, 1, 1))
                k[:, 0, 0], k[:, 1, 1] = k4[:, 0], k4[:, 1]
                k[:, 0, 2], k[:, 1, 2] = k4[:, 2], k4[:, 3]
                self._default_k_dev = jax.device_put(
                    {"intrinsics": k, "k4": k4})
            kd = self._default_k_dev
            batch = {"rgb": rgb, **kd}
        else:
            k4 = jnp.stack([intrinsics[:, 0, 0], intrinsics[:, 1, 1],
                            intrinsics[:, 0, 2], intrinsics[:, 1, 2]], -1)
            batch = {"rgb": rgb, "intrinsics": intrinsics, "k4": k4}
        if not self._derive_rays:
            raise ValueError("device-input path needs data.compute_rays "
                             "(rays are derived on device)")
        return batch

    def predict_stream(self, requests, depth: int = 2):
        """Pipelined serving over an iterable of requests.

        Each request is ``rgb`` or ``(rgb, intrinsics)``. Keeps up to
        ``depth`` requests in flight: request k+1's host staging + H2D
        upload + dispatch happen while request k still executes on
        device (JAX dispatch is asynchronous — the serial predict()
        loop instead blocks on every D2H readback before the next
        upload starts, paying the full transfer round trip per request;
        see PERF_NOTES.md serving note). Yields (N, H, W, 1) numpy
        depth maps in request order.
        """
        from collections import deque

        inflight: "deque" = deque()
        for req in requests:
            rgb, k = req if isinstance(req, tuple) else (req, None)
            if isinstance(rgb, jax.Array) and not isinstance(rgb, np.ndarray):
                out = self._compiled(self.state, self._device_batch(rgb, k))
                n = rgb.shape[0]
            else:
                rgb = np.asarray(rgb, np.float32)
                if rgb.ndim == 3:
                    rgb = rgb[None]
                n = rgb.shape[0]
                out = self._compiled(self.state, self._make_batch(rgb, k))
            inflight.append((out, n))
            while len(inflight) >= max(depth, 1):
                o, m = inflight.popleft()
                yield np.asarray(o)[:m]
        while inflight:
            o, m = inflight.popleft()
            yield np.asarray(o)[:m]

    # -- deployment artifact --------------------------------------------------

    def export_stablehlo(self, path: str) -> int:
        """Serialize the inference program (params baked in as constants)
        to a portable StableHLO artifact via ``jax.export``.

        The artifact is shape- and platform-locked to this Predictor's
        compiled configuration; reload anywhere with
        :func:`load_exported` — no model code, config, or checkpoint
        needed at serving time. Returns the byte size written.
        """
        from jax import export as jexport

        state = self.state
        fn = jax.jit(lambda batch: self._predict(state, batch))
        exported = jexport.export(fn)(self._shapes)
        blob = exported.serialize()
        with open(path, "wb") as f:
            f.write(blob)
        return len(blob)

    # -- performance --------------------------------------------------------

    def benchmark(self, iterations: int = 50,
                  warmup: int = 5) -> Dict[str, float]:
        """Latency distribution of the compiled executable (device-fenced)."""
        rng = np.random.default_rng(0)
        batch = self._make_batch(
            rng.uniform(0, 1, (self.batch_size, self.height, self.width, 3))
            .astype(np.float32), None)
        for _ in range(warmup):
            out = self._compiled(self.state, batch)
        np.asarray(out).ravel()[0]  # fence
        times = []
        for _ in range(iterations):
            t0 = time.perf_counter()
            out = self._compiled(self.state, batch)
            np.asarray(out).ravel()[0]
            times.append((time.perf_counter() - t0) * 1000.0)
        arr = np.asarray(times)
        return {
            "batch_size": float(self.batch_size),
            "mean_ms": float(arr.mean()),
            "p50_ms": float(np.percentile(arr, 50)),
            "p95_ms": float(np.percentile(arr, 95)),
            "p99_ms": float(np.percentile(arr, 99)),
            "images_per_sec": float(self.batch_size * 1000.0 / arr.mean()),
        }
