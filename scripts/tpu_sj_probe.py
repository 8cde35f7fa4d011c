"""Per-size subtile-height (sj) probe at 256^3 (one TPU process).

VERDICT r3 item 6: 256^3 runs at half the 512^3 rate and is COVERAGE-
bound (31.8% full-row k6 miss per the per-size sim, docs/KERNEL.md) —
the per-row v-span term is ``128*|dv/dlane| + sj*|dv/dsublane|``, so
shorter subtiles cut exactly the sublane tilt term that scales with
voxel size. sj was swept only at 512^3 (where sj64 won because the
select dot amortizes over tall subtiles); this measures sj in
{16, 32, 64} x k in {6, 10} at 256^3 x 32 views, plus a 512^3 sj32
cross-check row so a global regression would show.
"""

import sys
import time

sys.path.insert(0, ".")

import jax.numpy as jnp

from cudadepthmapintegration_tpu.core import RayPotential, VoxelGrid
from cudadepthmapintegration_tpu.kernels.integrate_pallas import (
    OrientedFusionPlan,
)
from cudadepthmapintegration_tpu.testing import (
    orbit_cameras,
    render_sphere_view,
)

PARAMS = RayPotential(thick=0.025, rho=0.8, eta=0.03, delta=0.1)


def workload(dims, n_views=32):
    grid = VoxelGrid(dims=(dims,) * 3, origin=(-1.6,) * 3,
                     spacing=(3.2 / (dims - 1),) * 3)
    cams = orbit_cameras(n_views, 4.0, focal=300.0, width=512,
                         image_height=512)
    views = [render_sphere_view(c, 512, 512, radius=1.0, background=-1.0)
             for c in cams]
    return grid, views


def main():
    import jax

    print(f"devices: {jax.devices()}", flush=True)
    for dims, rows in (
        (257, ((16, 6), (16, 10), (32, 6), (32, 10), (64, 6), (64, 10))),
        (513, ((32, 6), (64, 6))),
    ):
        grid, views = workload(dims)
        n_upd = grid.num_cells * len(views)
        ref = None
        for sj, k in rows:
            plan = OrientedFusionPlan(grid, views, PARAMS, subtile_rows=sj)
            kw = dict(mode="rowsel3", window_rows=64, rowsel_passes=k)
            t0 = time.time()
            try:
                checksum = float(plan.run(
                    jnp.zeros(grid.volume_shape, jnp.float32), **kw).sum())
                best = 1e9
                for _ in range(3):
                    t1 = time.perf_counter()
                    checksum = float(plan.run(
                        jnp.zeros(grid.volume_shape, jnp.float32),
                        **kw).sum())
                    best = min(best, time.perf_counter() - t1)
                tag = "" if ref is None or checksum == ref else "  MISMATCH"
                ref = checksum if ref is None else ref
                print(f"  {dims - 1}^3 sj{sj:2d} k{k:2d}: "
                      f"{n_upd / best / 1e9:5.2f} G ({best * 1e3:6.1f} ms) "
                      f"checksum {checksum:.6g}{tag} "
                      f"[incl compile {time.time() - t0:.0f}s]", flush=True)
            except Exception as e:
                print(f"  {dims - 1}^3 sj{sj:2d} k{k:2d}: FAILED "
                      f"[{type(e).__name__}] {str(e)[:140]}", flush=True)
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
