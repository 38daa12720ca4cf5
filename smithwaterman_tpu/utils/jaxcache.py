"""Persistent XLA compilation cache setup.

Shape-bucketed DP programs compile once per (bucket, mode); caching them on
disk makes every later process start warm.  Opt out with
``SWT_NO_COMPILE_CACHE=1``.
"""

from __future__ import annotations

import os


def enable_compilation_cache() -> None:
    if os.environ.get("SWT_NO_COMPILE_CACHE"):
        return
    try:
        import jax

        cache_dir = os.environ.get(
            "JAX_COMPILATION_CACHE_DIR",
            os.path.join(os.path.expanduser("~"), ".cache", "swt_jax_cache"),
        )
        os.makedirs(cache_dir, exist_ok=True)
        jax.config.update("jax_compilation_cache_dir", cache_dir)
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)
        jax.config.update("jax_persistent_cache_min_entry_size_bytes", 0)
    except Exception:  # pragma: no cover - cache is best-effort
        pass
