from ccv_mppi_path_tracker_tpu.utils.compile_cache import enable_compile_cache

__all__ = ["enable_compile_cache"]
