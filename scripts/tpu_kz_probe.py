"""Minimal kz probe: does the restructured kernel compile and run on
hardware at all? Tiny grid first (fast compiles), then 512^3 kz1/kz2.
Verbose staging prints so a stall is attributable to a specific step.
"""

import sys
import time

sys.path.insert(0, ".")

import jax.numpy as jnp

import bench  # noqa: E402


def run(dims, n_views, kz, reps=2):
    grid, views, params = bench.build_workload(dims=dims, n_views=n_views)
    print(f"[{dims - 1}^3 kz{kz}] plan...", flush=True)
    plan = bench.OrientedFusionPlan(grid, views, params, subtile_rows=64)
    kw = dict(mode="rowsel3", window_rows=64, rowsel_passes=6, z_block=kz)
    t0 = time.perf_counter()
    out = plan.run(jnp.zeros(grid.volume_shape, jnp.float32), **kw)
    checksum = float(out.sum())
    print(f"[{dims - 1}^3 kz{kz}] first call (compile) "
          f"{time.perf_counter() - t0:.1f}s checksum={checksum}", flush=True)
    best = 1e9
    for _ in range(reps):
        t0 = time.perf_counter()
        checksum = float(
            plan.run(jnp.zeros(grid.volume_shape, jnp.float32), **kw).sum()
        )
        best = min(best, time.perf_counter() - t0)
    ups = grid.num_cells * n_views / best
    print(f"[{dims - 1}^3 kz{kz}] {ups/1e9:.2f} G upd/s ({best*1000:.1f} ms)"
          f" checksum={checksum}", flush=True)


def main():
    run(65, 8, 1)
    run(65, 8, 2)
    run(513, 32, 1)
    run(513, 32, 2)
    run(513, 32, 4)


if __name__ == "__main__":
    main()
