"""Model evaluation: per-sample metrics, timing, aggregation, reports.

Implements the *intended* behavior of `src/evaluation/evaluator.h` +
`evaluate_main.cpp` (the reference's per-sample forward is stubbed and
the two files don't compile together — SURVEY §2.7): warmup iterations
then timed per-sample inference with device fences, per-sample metric
records, mean/std/median aggregation, FPS, parameter count/model size,
CSV export, and a text report.

TPU-native twist: per-sample metrics are computed on device by a
vmapped kernel per *batch* rather than a host loop per sample, so the
eval pass is one compiled program per batch.
"""

from __future__ import annotations

import dataclasses
import time
from typing import Dict, List, Optional

import jax
import numpy as np

from cadepth_tpu.config import Config
from cadepth_tpu.data.pipeline import InputPipeline
from cadepth_tpu.data.sunrgbd import SunRGBDLoader
from cadepth_tpu.metrics.depth_metrics import (
    METRIC_NAMES,
    compute_depth_metrics_per_sample,
)
from cadepth_tpu.models.factory import count_parameters
from cadepth_tpu.training.train_state import TrainState, make_predict_fn


@dataclasses.dataclass
class EvaluationConfig:
    """Parity with `EvaluationConfig` (`evaluator.h:19-52`)."""

    min_depth: float = 0.1
    max_depth: float = 10.0
    warmup_iterations: int = 5
    batch_size: int = 1
    num_vis_samples: int = 4
    save_predictions: bool = False
    colormap: str = "viridis"


@dataclasses.dataclass
class EvaluationResult:
    """Aggregate record (`evaluator.h:57-94`)."""

    mean_metrics: Dict[str, float]
    std_metrics: Dict[str, float]
    median_metrics: Dict[str, float]
    per_sample: List[Dict[str, float]]
    inference_ms_mean: float
    inference_ms_std: float
    fps: float
    num_samples: int
    num_params: int
    model_size_mb: float
    timestamp: str


class ModelEvaluator:
    def __init__(self, cfg: Config, model, state: TrainState,
                 eval_cfg: Optional[EvaluationConfig] = None):
        self.cfg = cfg
        self.model = model
        self.state = state
        self.eval_cfg = eval_cfg or EvaluationConfig(
            min_depth=cfg.validation.min_depth,
            max_depth=cfg.validation.max_depth)
        self.predict_fn = make_predict_fn(cfg, model)

    def evaluate(self, loader: SunRGBDLoader,
                 max_samples: Optional[int] = None,
                 device_resident: bool = False) -> EvaluationResult:
        """Warmup, timed per-batch inference, per-sample metrics
        (`evaluator.h:142-226,281-302`).

        ``device_resident`` uploads the (packed) dataset to HBM once and
        sweeps it with on-device gathers — same exact full sweep, no
        per-batch host->device image transfer."""
        ecfg = self.eval_cfg
        bsz = max(ecfg.batch_size, 1)
        if device_resident:
            import jax.numpy as jnp

            from cadepth_tpu.data.device_resident import (
                ChunkedDeviceDataset,
                DeviceDataset,
            )

            # Honor the training-side capacity knobs: chunked streaming
            # for packs bigger than HBM, quantized storage for 3.2x less
            # of it. Eval metrics through the quantized path differ only
            # by the documented encodings (depth stored mm-exact).
            chunk = getattr(self.cfg.data, "device_resident_chunk_samples",
                            0)
            ds_kw = {}
            if getattr(self.cfg.data, "device_resident_dtype",
                       "float32") == "quantized":
                ds_kw = {"rgb_dtype": jnp.uint8, "depth_dtype": jnp.uint16}
            n = len(loader) if max_samples is None \
                else min(len(loader), max_samples)
            if chunk > 0:
                cds = ChunkedDeviceDataset(loader, chunk, **ds_kw)
                # exact sweep: identity order, padded-gather tail
                # trimmed by batches() itself, every sample once
                pipe = cds.batches(bsz, shuffle=False, epoch=0,
                                   augment=False, drop_remainder=False,
                                   max_samples=n)
                # warm against the sweep's EFFECTIVE chunk shape
                # (batches() rounds the chunk to a batch multiple), so
                # the timed loop never compiles a new gather shape
                c_eff = min(max(cds.chunk_samples
                                - cds.chunk_samples % bsz, bsz), n)
                # grow the staging slots to the effective chunk before
                # this direct _upload — batches() does this itself, but
                # the warm-up path bypasses it (with batch_size >
                # chunk_samples the slots are otherwise too small)
                cds._ensure_slots(c_eff)
                warm = cds._upload(np.arange(c_eff), slot=0, block=True)
                warm = cds._gather(
                    warm["rgb"], warm["depth"], warm["k"], warm["gids"],
                    jnp.asarray(np.arange(bsz) % c_eff, jnp.int32),
                    jnp.int32(0), augment=False)
            else:
                ds = DeviceDataset(loader, **ds_kw)

                def device_sweep():
                    ep = jnp.int32(0)
                    for s in range(0, n, bsz):
                        idx = np.arange(s, min(s + bsz, n))
                        valid = len(idx)
                        if valid < bsz:  # pad the gather, trim outputs
                            idx = np.concatenate(
                                [idx, np.zeros(bsz - valid, np.int64)])
                        b = ds._gather(jnp.asarray(idx, jnp.int32), ep,
                                       augment=False)
                        yield ({k: v[:valid] for k, v in b.items()}
                               if valid < bsz else b)

                pipe = device_sweep()
                warm = ds._gather(
                    np.arange(min(bsz, n), dtype=np.int32), 0,
                    augment=False)
        else:
            pipe = InputPipeline(loader, batch_size=bsz,
                                 shuffle=False, drop_remainder=False,
                                 max_samples=max_samples)
            # Warmup (evaluator.h:154-157): compile + spin the device.
            warm = jax.device_put(loader.get_batch(
                range(min(bsz, len(loader)))))
        for _ in range(ecfg.warmup_iterations):
            jax.block_until_ready(self.predict_fn(self.state, warm))

        per_sample: List[Dict[str, float]] = []
        times_ms: List[float] = []
        for batch in pipe:
            t0 = time.perf_counter()
            pred = jax.block_until_ready(self.predict_fn(self.state, batch))
            elapsed_ms = (time.perf_counter() - t0) * 1000.0
            # NB: a fresh name — `bsz` is captured by the device_sweep
            # generator above and must not be rebound mid-iteration.
            n_in_batch = pred.shape[0]
            times_ms.extend([elapsed_ms / n_in_batch] * n_in_batch)
            metrics = compute_depth_metrics_per_sample(
                pred, batch["depth"],
                min_depth=ecfg.min_depth, max_depth=ecfg.max_depth)
            host = {k: np.asarray(v) for k, v in metrics.items()}
            for i in range(n_in_batch):
                per_sample.append({k: float(v[i]) for k, v in host.items()})

        def agg(fn):
            return {k: float(fn([s[k] for s in per_sample]))
                    for k in METRIC_NAMES} if per_sample else {}

        times = np.asarray(times_ms) if times_ms else np.zeros(1)
        num_params = count_parameters(self.state.params)
        return EvaluationResult(
            mean_metrics=agg(np.mean),
            std_metrics=agg(lambda v: np.std(v)),
            median_metrics=agg(np.median),
            per_sample=per_sample,
            inference_ms_mean=float(times.mean()),
            inference_ms_std=float(times.std()),
            fps=float(1000.0 / times.mean()) if times.mean() > 0 else 0.0,
            num_samples=len(per_sample),
            num_params=num_params,
            model_size_mb=num_params * 4 / (1024.0 * 1024.0),
            timestamp=time.strftime("%Y-%m-%d %H:%M:%S"),
        )

    # -- outputs ------------------------------------------------------------

    @staticmethod
    def write_csv(result: EvaluationResult, path: str) -> None:
        """Per-sample CSV (`evaluator.h:486-543`)."""
        keys = list(METRIC_NAMES)
        with open(path, "w") as f:
            f.write("sample," + ",".join(keys) + "\n")
            for i, s in enumerate(result.per_sample):
                f.write(f"{i}," + ",".join(f"{s[k]:.6f}" for k in keys) + "\n")

    @staticmethod
    def write_summary_csv(result: EvaluationResult, path: str) -> None:
        with open(path, "w") as f:
            f.write("metric,mean,std,median\n")
            for k in METRIC_NAMES:
                f.write(f"{k},{result.mean_metrics.get(k, 0):.6f},"
                        f"{result.std_metrics.get(k, 0):.6f},"
                        f"{result.median_metrics.get(k, 0):.6f}\n")

    @staticmethod
    def report(result: EvaluationResult, model_name: str = "model") -> str:
        """Text report (`evaluate_main.cpp:214-278`)."""
        m, s = result.mean_metrics, result.std_metrics
        lines = [
            "=" * 60,
            f"Evaluation report — {model_name}",
            f"Generated: {result.timestamp}",
            "=" * 60,
            "",
            f"Samples evaluated: {result.num_samples}",
            f"Parameters: {result.num_params:,} "
            f"({result.model_size_mb:.1f} MB fp32)",
            f"Inference: {result.inference_ms_mean:.2f} ± "
            f"{result.inference_ms_std:.2f} ms/image ({result.fps:.1f} FPS)",
            "",
            "Error metrics (mean ± std, lower is better):",
        ]
        for k in ("abs_rel", "sq_rel", "rmse", "rmse_log", "mae", "log10"):
            lines.append(f"  {k:12s} {m.get(k, 0):.4f} ± {s.get(k, 0):.4f}")
        lines.append("")
        lines.append("Accuracy metrics (higher is better):")
        for k in ("delta_1.25", "delta_1.25^2", "delta_1.25^3"):
            lines.append(f"  {k:12s} {m.get(k, 0):.4f}")
        return "\n".join(lines)
