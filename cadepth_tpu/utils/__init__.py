from cadepth_tpu.utils.compilation_cache import enable_compilation_cache
from cadepth_tpu.utils.profiling import (
    StepTimer,
    enable_nan_debugging,
    hard_sync,
    profile_trace,
)

__all__ = [
    "enable_compilation_cache",
    "StepTimer",
    "enable_nan_debugging",
    "hard_sync",
    "profile_trace",
]
