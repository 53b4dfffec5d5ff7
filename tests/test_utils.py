"""Utils: step timer, hard sync, compilation cache plumbing."""

import time

import jax
import jax.numpy as jnp

from cadepth_tpu.utils import StepTimer, hard_sync, enable_compilation_cache


def test_step_timer_rate():
    timer = StepTimer()
    x = jnp.ones((8,))
    timer.step(4)  # warmup step, excluded
    time.sleep(0.05)
    timer.step(4)
    timer.step(4)
    rate = timer.rate(x)
    assert timer.steps == 2
    assert rate > 0
    timer.reset()
    assert timer.rate() == 0.0


def test_hard_sync_noop_on_empty():
    hard_sync({})
    hard_sync(jnp.ones((2, 2)))


def test_compilation_cache_dir(tmp_path):
    d = enable_compilation_cache(str(tmp_path / "cache"))
    assert (tmp_path / "cache").is_dir()
    assert d == str(tmp_path / "cache")
    # a jit call larger than the threshold populates the cache
    f = jax.jit(lambda x: x * 2 + jnp.sin(x).sum())
    f(jnp.ones((64, 64))).block_until_ready()
