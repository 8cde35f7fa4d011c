"""Benchmark: TSDF fusion throughput on the attached TPU chip.

Workload (BASELINE.json config 3 scale): 512^3-cell grid, 32 synthetic
512x512 depth maps with full calibration, float32, Pallas integrate kernel
(orientation-grouped, prestaged). Reports voxel updates/sec.

``vs_baseline``: speedup over the XLA-compiled integrator on the SAME chip —
the portable lowering of the same op (the reference publishes no numbers:
BASELINE.md), so the in-repo XLA path is the measurable baseline.

Prints exactly one JSON line:
  {"metric": ..., "value": N, "unit": ..., "vs_baseline": N}
"""

import json
import os
import sys
import time

os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/root/.jax_bench_cache")

import jax
import jax.numpy as jnp
import numpy as np

jax.config.update("jax_compilation_cache_dir",
                  os.environ["JAX_COMPILATION_CACHE_DIR"])
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.0)

from cudadepthmapintegration_tpu.core import RayPotential, VoxelGrid
from cudadepthmapintegration_tpu.kernels.integrate_pallas import OrientedFusionPlan
from cudadepthmapintegration_tpu.ops import integrate as I
from cudadepthmapintegration_tpu.testing import orbit_cameras, render_sphere_view


def build_workload(dims=513, n_views=32, width=512, height=512):
    grid = VoxelGrid(
        dims=(dims,) * 3, origin=(-1.6,) * 3, spacing=(3.2 / (dims - 1),) * 3
    )
    cams = orbit_cameras(
        n_views, 4.0, focal=300.0, width=width, image_height=height
    )
    views = [
        render_sphere_view(c, width, height, radius=1.0, background=-1.0)
        for c in cams
    ]
    params = RayPotential(thick=0.025, rho=0.8, eta=0.03, delta=0.1)
    return grid, views, params


def bench_pallas(grid, views, params, reps=2):
    plan = OrientedFusionPlan(grid, views, params)
    out = plan.run(jnp.zeros(grid.volume_shape, jnp.float32))
    checksum = float(out.sum())  # warms compiles + forces completion
    t0 = time.perf_counter()
    for _ in range(reps):
        checksum = float(
            plan.run(jnp.zeros(grid.volume_shape, jnp.float32)).sum()
        )
    dt = (time.perf_counter() - t0) / reps
    return dt, checksum


def bench_xla(grid, views, params, reps=1):
    h, w = views[0].depth.shape
    t = I.projection_tables(grid, views, np.float32)
    depths = np.stack([v.depth for v in views]).astype(np.float32)
    args = [jnp.asarray(a) for a in (t.tx, t.ty, t.tz, t.tc, depths)]
    kw = dict(
        h=int(h), w=int(w), view_batch=8,
        thick=params.thick, rho=params.rho, eta=params.eta, delta=params.delta,
    )
    vol = jnp.zeros(grid.volume_shape, jnp.float32)
    vol = I._integrate_batched(vol, *args, **kw)
    checksum = float(vol.sum())
    t0 = time.perf_counter()
    for _ in range(reps):
        vol2 = jnp.zeros(grid.volume_shape, jnp.float32)
        checksum = float(I._integrate_batched(vol2, *args, **kw).sum())
    dt = (time.perf_counter() - t0) / reps
    return dt, checksum


def main():
    grid, views, params = build_workload()
    n_updates = grid.num_cells * len(views)

    t_pallas, sum_p = bench_pallas(grid, views, params)
    t_xla, sum_x = bench_xla(grid, views, params)

    value = n_updates / t_pallas
    vs_baseline = t_xla / t_pallas
    # Sanity: both paths fused the same scene (fp32 ordering differences only).
    rel = abs(sum_p - sum_x) / max(abs(sum_x), 1.0)
    if rel > 1e-3:
        print(
            f"WARNING: pallas/xla checksums diverge: {sum_p} vs {sum_x}",
            file=sys.stderr,
        )

    print(
        json.dumps(
            {
                "metric": "tsdf_voxel_updates_per_sec_512cube_32views",
                "value": round(value / 1e9, 4) * 1e9,
                "unit": "voxel_updates/s",
                "vs_baseline": round(vs_baseline, 3),
            }
        )
    )


if __name__ == "__main__":
    main()
