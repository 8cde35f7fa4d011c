"""Validate the round-2.5 bench defaults on hardware in one session.

1. rowsel3 k6 wc2 vb1 at all three bench grid sizes (256/512/1024).
2. The 5-case parity gate at the new defaults.
3. Sparse fps with the (fixed) Pallas point-gather vs the XLA take.

Run ALONE (one JAX process at a time on this rig); prints incrementally.
"""

import sys
import time

sys.path.insert(0, ".")

import jax
import jax.numpy as jnp

sys.argv = [sys.argv[0]]
import bench  # noqa: E402
import tpu_validate  # noqa: E402


def main():
    kw = dict(**bench.KERNEL_RUN_KW)

    print("== rowsel3 k6 wc2 vb1 across grid sizes ==", flush=True)
    for dims, n_views, reps in ((513, 32, 3), (257, 32, 3), (1025, 16, 2)):
        try:
            g, v, p = bench.build_workload(dims=dims, n_views=n_views)
            plan = bench.OrientedFusionPlan(g, v, p, subtile_rows=64)
            float(plan.run(jnp.zeros(g.volume_shape, jnp.float32),
                           **kw).sum())
            best = 1e9
            for _ in range(reps):
                t0 = time.perf_counter()
                float(plan.run(jnp.zeros(g.volume_shape, jnp.float32),
                               **kw).sum())
                best = min(best, time.perf_counter() - t0)
            n_upd = g.num_cells * n_views
            print(f"  {dims - 1}^3 x {n_views}: {best * 1000:7.1f} ms  "
                  f"{n_upd / best / 1e9:5.2f} G upd/s", flush=True)
            del plan
        except Exception as e:
            print(f"  {dims - 1}^3: FAILED {type(e).__name__}: "
                  f"{str(e).splitlines()[0][:140]}", flush=True)

    print("== 5-case parity gate (new defaults) ==", flush=True)
    ok, max_flip = tpu_validate.run_parity(
        verbose=True, **bench.KERNEL_PLAN_KW, **bench.KERNEL_RUN_KW
    )
    print(f"  parity ok={ok} max_flip={max_flip:.2e}", flush=True)

    print("== sparse fps: pallas gather vs xla take ==", flush=True)
    from cudadepthmapintegration_tpu.core import RayPotential
    from cudadepthmapintegration_tpu.ops.sparse_grid import SparseTSDFGrid
    from cudadepthmapintegration_tpu.testing import (
        orbit_cameras, render_sphere_view,
    )

    p2 = RayPotential(thick=0.04, rho=0.8, eta=0.03, delta=0.16)
    cams = orbit_cameras(48, 4.0, focal=150.0, width=256, image_height=192)
    sviews = [render_sphere_view(c, 256, 192) for c in cams]
    for backend in ("pallas", "xla"):
        try:
            sparse = SparseTSDFGrid(voxel_size=0.02, params=p2,
                                    pixel_stride=4, gather_backend=backend)
            for v in sviews:
                sparse.integrate_frame(v)
            ref = float(sparse.pool.sum())
            t0 = time.perf_counter()
            for v in sviews:
                sparse.integrate_frame(v)
            float(sparse.pool.sum())
            dt = time.perf_counter() - t0
            print(f"  {backend:6s}: {len(sviews) / dt:6.1f} fps "
                  f"({dt / len(sviews) * 1000:6.2f} ms/frame, "
                  f"{sparse.num_allocated} blocks, checksum {ref:.6e})",
                  flush=True)
        except Exception as e:
            print(f"  {backend:6s}: FAILED {type(e).__name__}: "
                  f"{str(e).splitlines()[0][:140]}", flush=True)
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
