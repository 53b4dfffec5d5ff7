from cadepth_tpu.utils.compilation_cache import enable_compilation_cache

__all__ = ["enable_compilation_cache"]
