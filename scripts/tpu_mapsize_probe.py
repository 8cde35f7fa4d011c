"""TPU probe: depth-map SIZE ceiling of the Pallas integrate kernel.

rowsel3 stages the full padded (3, hp, wp) split-plane block in VMEM per
view step (double-buffered), so map size — not grid size — is the VMEM
binding: 3*hp*wp*4*2 bytes. Predicted ceiling ~0.7 MP. This probe
measures throughput at VGA-class sizes (incl. the wr32-vs-wr64 window
tuning datum) and records the exact failure mode past the ceiling, to
back the plan-level guard / fallback.

One process (tunnel discipline, CLAUDE.md).
"""

import sys
import time

sys.path.insert(0, ".")

import jax.numpy as jnp
import numpy as np

from cudadepthmapintegration_tpu.core import RayPotential, VoxelGrid
from cudadepthmapintegration_tpu.kernels.integrate_pallas import (
    OrientedFusionPlan,
)
from cudadepthmapintegration_tpu.testing import (
    orbit_cameras,
    render_sphere_view,
)


def workload(w, h, dims=257, n_views=8, focal=None):
    grid = VoxelGrid(dims=(dims,) * 3, origin=(-1.6,) * 3,
                     spacing=(3.2 / (dims - 1),) * 3)
    cams = orbit_cameras(n_views, 4.0, focal=focal or (0.6 * w),
                         width=w, image_height=h)
    views = [render_sphere_view(c, w, h, radius=1.0, background=-1.0)
             for c in cams]
    return grid, views, RayPotential(thick=0.025, rho=0.8, eta=0.03,
                                     delta=0.1)


def probe(w, h, n_views=8, reps=3, **run_kw):
    grid, views, params = workload(w, h, n_views=n_views)
    plan = OrientedFusionPlan(grid, views, params, subtile_rows=64)
    kw = dict(mode="rowsel3", window_rows=64, rowsel_passes=6)
    kw.update(run_kw)
    label = f"{w}x{h} maps, wr{kw['window_rows']}"
    try:
        out = plan.run(jnp.zeros(grid.volume_shape, jnp.float32), **kw)
        checksum = float(out.sum())
        best = 1e9
        for _ in range(reps):
            t0 = time.perf_counter()
            checksum = float(
                plan.run(jnp.zeros(grid.volume_shape, jnp.float32),
                         **kw).sum()
            )
            best = min(best, time.perf_counter() - t0)
        ups = grid.num_cells * n_views / best
        print(f"  {label}: {ups / 1e9:6.2f} G upd/s ({best * 1000:7.1f} ms)"
              f" checksum {checksum:.6g}", flush=True)
    except Exception as e:
        print(f"  {label}: FAILED [{type(e).__name__}] {str(e)[:160]}",
              flush=True)


def main():
    print("== VGA-class sizes + wr tuning (256^3 x 8 views) ==", flush=True)
    probe(640, 480, window_rows=64)
    probe(640, 480, window_rows=32)
    probe(512, 512, window_rows=64)  # bench-geometry anchor at this view count
    print("== ceiling probes ==", flush=True)
    probe(800, 600, window_rows=64)   # 5.8 MB/plane-block x2 = 11.5 MB
    probe(1024, 768, window_rows=64)  # 9.4 MB x2 = 18.9 MB: expect OOM
    probe(1280, 960, window_rows=64)  # 14.7 MB x2: expect OOM
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
