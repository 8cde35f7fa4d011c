"""One-off v2-kernel tuning sweep on the attached TPU chip.

Times mode x tunables at config-3 scale (512^3 x 32 views) with prestaged
plans (device-resident steady state), printing G voxel-updates/s per
variant. Run alone (one JAX process at a time on this rig).
"""

import sys
import time

sys.path.insert(0, ".")

import jax.numpy as jnp

sys.argv = [sys.argv[0]]
import bench  # noqa: E402  (reuses the workload builder + cache config)


def run(plan, grid, nv, reps=3, **kw):
    out = plan.run(jnp.zeros(grid.volume_shape, jnp.float32), **kw)
    checksum = float(out.sum())
    best = 1e9
    for _ in range(reps):
        t0 = time.perf_counter()
        c = float(plan.run(jnp.zeros(grid.volume_shape, jnp.float32), **kw).sum())
        best = min(best, time.perf_counter() - t0)
    ups = grid.num_cells * nv / best
    return ups, best, checksum


def main():
    grid, views, params = bench.build_workload()
    nv = len(views)
    variants = [
        ("rowsel wr64 k3 sj64 fused", dict(subtile_rows=64),
         dict(mode="rowsel", window_rows=64, rowsel_passes=3)),
        ("rowsel wr64 k2 sj64 fused", dict(subtile_rows=64),
         dict(mode="rowsel", window_rows=64, rowsel_passes=2)),
    ]
    plans = {}
    ref = None
    for name, plan_kw, run_kw in variants:
        key = tuple(sorted(plan_kw.items()))
        if key not in plans:
            plans[key] = bench.OrientedFusionPlan(grid, views, params, **plan_kw)
        ups, dt, checksum = run(plans[key], grid, nv, **run_kw)
        if ref is None:
            ref = checksum
        tag = "" if abs(checksum - ref) <= 1e-3 * abs(ref) else "  CHECKSUM MISMATCH!"
        print(f"{name:36s} {ups/1e9:6.2f} G upd/s  ({dt*1000:7.1f} ms){tag}",
              flush=True)


if __name__ == "__main__":
    main()
