"""Persistent XLA compilation cache.

This container's remote-compile service is slow/flaky for large programs;
the on-disk cache makes repeat runs (CLI, bench, driver) start in seconds.
"""

from __future__ import annotations

import os


def enable_compile_cache(path: str | None = None) -> str:
    import jax

    if path is None:
        path = os.environ.get(
            "JAX_COMPILATION_CACHE_DIR",
            os.path.join(
                os.path.dirname(os.path.dirname(os.path.dirname(
                    os.path.abspath(__file__)))),
                ".jax_cache",
            ),
        )
    os.makedirs(path, exist_ok=True)
    jax.config.update("jax_compilation_cache_dir", path)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)
    return path
