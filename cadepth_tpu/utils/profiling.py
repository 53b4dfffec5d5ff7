"""Profiling + step timing utilities.

TPU-native replacement for the reference's wall-clock-only tracing
(SURVEY §5.1: std::chrono in the trainers, a dead `profiler_interval`
knob): `jax.profiler` traces viewable in TensorBoard/Perfetto plus a
fence-correct step timer.

Note on fencing: on tunneled runtimes a single output's
`block_until_ready` can return before the whole program retires, so
`hard_sync` forces an actual device->host readback (see bench.py).
"""

from __future__ import annotations

import contextlib
import time
from typing import Iterator, Optional

import jax
import numpy as np


def hard_sync(tree) -> None:
    """Fence: force a device->host readback of one leaf of `tree`."""
    leaves = jax.tree_util.tree_leaves(tree)
    if leaves:
        np.asarray(leaves[0]).ravel()


@contextlib.contextmanager
def profile_trace(log_dir: str) -> Iterator[None]:
    """Capture a jax.profiler trace (open in TensorBoard's Profile tab)."""
    jax.profiler.start_trace(log_dir)
    try:
        yield
    finally:
        jax.profiler.stop_trace()


class StepTimer:
    """Rolling step timing with correct device fencing.

    Usage:
        timer = StepTimer()
        for batch in pipe:
            state, logs = train_step(state, batch)
            timer.step(batch_size)           # async bookkeeping
        images_per_sec = timer.rate(state)   # fences + computes
    """

    def __init__(self) -> None:
        self.reset()

    def reset(self) -> None:
        self._t0: Optional[float] = None
        self._items = 0
        self._steps = 0

    def step(self, num_items: int = 1) -> None:
        if self._t0 is None:
            self._t0 = time.perf_counter()
        else:
            # first step excluded: it absorbs compile/dispatch warmup
            self._items += num_items
            self._steps += 1

    def rate(self, fence_tree=None) -> float:
        """items/sec over the timed window (fences on `fence_tree`)."""
        if self._t0 is None or self._steps == 0:
            return 0.0
        if fence_tree is not None:
            hard_sync(fence_tree)
        elapsed = time.perf_counter() - self._t0
        return self._items / elapsed if elapsed > 0 else 0.0

    @property
    def steps(self) -> int:
        return self._steps


def enable_nan_debugging() -> None:
    """Turn on jax NaN checking (SURVEY §5.2 — replaces sanitizers the
    reference never had). Slows execution; debug only."""
    jax.config.update("jax_debug_nans", True)
