"""Test configuration: force an 8-device CPU platform so multi-chip sharding
logic runs without TPU hardware (the standard JAX testing pattern)."""

import os

# Force override: the environment may pin JAX_PLATFORMS to a TPU plugin, but
# tests must run on the virtual 8-device CPU platform.
os.environ["JAX_PLATFORMS"] = "cpu"
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()

import jax  # noqa: E402

# jax reads JAX_PLATFORMS at import time, and the interpreter's sitecustomize
# may import jax (TPU plugin registration) before this conftest runs — so the
# env var alone is not enough; update the live config too.
jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_enable_x64", True)
# Persistent compilation cache: this box has 4 CPUs, so XLA compiles dominate
# test wall time; cache them across pytest processes.
jax.config.update("jax_compilation_cache_dir", "/root/.jax_test_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.0)
jax.config.update("jax_persistent_cache_min_entry_size_bytes", 0)
