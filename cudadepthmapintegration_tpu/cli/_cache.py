"""Persistent-compilation-cache setup for CLI entry points.

XLA compiles of the fusion graphs take minutes on small hosts; caching them
makes repeat CLI invocations start in seconds. Opt out with
CDMI_NO_COMPILE_CACHE=1; override the location with JAX_COMPILATION_CACHE_DIR.
"""

from __future__ import annotations

import os

__all__ = ["enable_compile_cache"]


def enable_compile_cache() -> None:
    if os.environ.get("CDMI_NO_COMPILE_CACHE"):
        return
    import jax

    cache_dir = os.environ.get(
        "JAX_COMPILATION_CACHE_DIR",
        os.path.join(os.path.expanduser("~"), ".cache", "cdmi_jax"),
    )
    try:
        jax.config.update("jax_compilation_cache_dir", cache_dir)
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    except Exception:
        pass  # older jax without these options: run uncached
