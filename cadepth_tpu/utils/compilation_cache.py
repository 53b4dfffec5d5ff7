"""Persistent XLA compilation cache.

The geometry-aware train step takes minutes to compile on TPU (gather/
scatter-heavy PCL backward); the reference never had this problem
because LibTorch is eager. The persistent cache makes every compile a
one-time cost per (program, topology): subsequent CLI runs, restarts,
and resumes load the compiled executable from disk in seconds.
"""

from __future__ import annotations

import os


def enable_compilation_cache(cache_dir: str | None = None) -> str:
    """Enable JAX's persistent compilation cache. Returns the cache dir."""
    import jax

    cache_dir = cache_dir or os.environ.get(
        "CADEPTH_COMPILATION_CACHE",
        os.path.join(os.path.expanduser("~"), ".cache", "cadepth_tpu_xla"))
    os.makedirs(cache_dir, exist_ok=True)
    jax.config.update("jax_compilation_cache_dir", cache_dir)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    jax.config.update("jax_persistent_cache_min_entry_size_bytes", 0)
    return cache_dir
