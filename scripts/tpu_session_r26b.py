"""TPU session r2.6b: coloration kernel throughput with device-resident
staging (the r26 session measured the OLD wrapper, which re-uploaded
~190 MB of planes per call through the 6 MB/s tunnel)."""

import sys

sys.path.insert(0, ".")
sys.path.insert(0, "scripts")

import os

os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/root/.jax_bench_cache")

import tpu_coloration_bench

if __name__ == "__main__":
    raise SystemExit(tpu_coloration_bench.main())
