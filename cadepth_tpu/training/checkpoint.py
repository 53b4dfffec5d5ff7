"""Checkpoint save / restore / retention / best-model tracking (Orbax).

The reference saves model weights every `save_interval` epochs and has a
fully-designed but never-wired resume path (`trainer.h:330-367,536-574`,
SURVEY §5.4). Here the full state — params, batch_stats, optimizer
state, step, best-metric bookkeeping — round-trips, retention keeps the
last N checkpoints, the best model is tracked by the monitored metric,
and `--resume` actually works.
"""

from __future__ import annotations

import json
import shutil
from pathlib import Path
from typing import Any, Dict, Optional

import jax
import orbax.checkpoint as ocp

from cadepth_tpu.training.train_state import TrainState


class CheckpointManager:
    def __init__(
        self,
        directory: str,
        keep_last_n: int = 3,
        metric_name: str = "abs_rel",
        metric_lower_is_better: bool = True,
    ):
        self.directory = Path(directory).absolute()
        self.directory.mkdir(parents=True, exist_ok=True)
        self.keep_last_n = keep_last_n
        self.metric_name = metric_name
        self.metric_lower_is_better = metric_lower_is_better
        self._checkpointer = ocp.StandardCheckpointer()
        # (ckpt_dir, meta, is_best) of an in-flight async save; its meta/
        # best/retention bookkeeping runs in finalize() after the write
        # lands. At most one save is in flight at a time.
        self._pending = None

    # -- paths ----------------------------------------------------------

    def _step_dir(self, step: int) -> Path:
        return self.directory / f"step_{step:08d}"

    @property
    def best_dir(self) -> Path:
        return self.directory / "best"

    def _meta_path(self, ckpt_dir: Path) -> Path:
        return ckpt_dir.with_suffix(".meta.json")

    # -- save -------------------------------------------------------------

    def save(self, state: TrainState, epoch: int,
             metrics: Optional[Dict[str, float]] = None,
             is_best: bool = False, blocking: bool = True) -> str:
        """Write a step checkpoint (+ meta, best copy, retention).

        ``blocking=False`` returns as soon as Orbax has snapshotted the
        arrays: the serialization overlaps the next epoch's compute and
        the meta/best/retention bookkeeping is deferred to
        :meth:`finalize` (called automatically before the next save or
        any restore/lookup). The reference trainer blocks the loop on
        `torch::save` (`tensorboard_trainer_enhanced.h:656-662`).
        """
        self.finalize()
        step = int(state.step)
        ckpt_dir = self._step_dir(step)
        if ckpt_dir.exists():
            shutil.rmtree(ckpt_dir)
        self._checkpointer.save(ckpt_dir, state)
        meta = {
            "epoch": epoch,
            "global_step": step,
            "metrics": {k: float(v) for k, v in (metrics or {}).items()},
        }
        self._pending = (ckpt_dir, meta, is_best)
        if blocking:
            self.finalize()
        return str(ckpt_dir)

    def finalize(self) -> None:
        """Block until any in-flight save lands, then run its bookkeeping."""
        if self._pending is None:
            return
        ckpt_dir, meta, is_best = self._pending
        self._pending = None
        self._checkpointer.wait_until_finished()
        self._meta_path(ckpt_dir).write_text(json.dumps(meta, indent=2))
        if is_best:
            if self.best_dir.exists():
                shutil.rmtree(self.best_dir)
            shutil.copytree(ckpt_dir, self.best_dir)
            self._meta_path(self.best_dir).write_text(json.dumps(meta, indent=2))
        self._cleanup()

    def _cleanup(self) -> None:
        """Keep only the N most recent step checkpoints (trainer.h:536-574)."""
        ckpts = sorted(self.directory.glob("step_*"))
        ckpts = [c for c in ckpts if c.is_dir()]
        for old in ckpts[: max(0, len(ckpts) - self.keep_last_n)]:
            shutil.rmtree(old, ignore_errors=True)
            meta = self._meta_path(old)
            if meta.exists():
                meta.unlink()

    # -- restore ------------------------------------------------------------

    def latest_checkpoint(self) -> Optional[str]:
        self.finalize()
        ckpts = sorted(self.directory.glob("step_*"))
        ckpts = [c for c in ckpts if c.is_dir()]
        return str(ckpts[-1]) if ckpts else None

    def restore(self, path: str, target: TrainState) -> TrainState:
        """Restore into the structure of `target` (shapes/dtypes/shardings)."""
        self.finalize()
        abstract = jax.tree_util.tree_map(ocp.utils.to_shape_dtype_struct, target)
        return self._checkpointer.restore(Path(path).absolute(), abstract)

    def best_metric_value(self) -> Optional[float]:
        """The monitored metric stored with the best/ checkpoint, if any."""
        self.finalize()
        meta_path = self._meta_path(self.best_dir)
        if not meta_path.exists():
            return None
        metrics = json.loads(meta_path.read_text()).get("metrics", {})
        value = metrics.get(self.metric_name)
        return float(value) if value is not None else None

    def restore_with_meta(self, path: str, target: TrainState):
        state = self.restore(path, target)
        meta_path = self._meta_path(Path(path).absolute())
        meta: Dict[str, Any] = {}
        if meta_path.exists():
            meta = json.loads(meta_path.read_text())
        return state, meta
