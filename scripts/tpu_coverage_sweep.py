"""Static-coverage sweep: miss fraction + time vs rowsel pass count.

The miss-tracking kernel showed ~47% of voxel-view pairs @512^3 x 32 exceed
n_k=2 row-select coverage — the remainder walk is real work, not overhead.
Passes are cheap (~11 ms each at rowsel3's DEFAULT-precision dots), so this
sweep maps the coverage curve to pick how many passes collapse the inline
remainder to ~zero iterations:

1. rowsel3m fast-path time + miss count across (n_k, n_wc) — the miss
   counter is the coverage diagnostic (no re-dispatch: raw runner).
2. Exact rowsel3 end-to-end time at the promising n_k values (what ships).
3. Sparse-path fps with the new Pallas point-gather vs the XLA take.

Run ALONE (one JAX process at a time on this rig); prints incrementally.
"""

import sys
import time

sys.path.insert(0, ".")

import jax
import jax.numpy as jnp

sys.argv = [sys.argv[0]]
import bench  # noqa: E402


def main():
    grid, views, params = bench.build_workload()
    nv = len(views)
    n_upd = grid.num_cells * nv
    plan = bench.OrientedFusionPlan(grid, views, params, subtile_rows=64)

    print("== rowsel3m coverage sweep @512^3 x 32 ==", flush=True)
    for n_k, n_wc in [(2, 2), (4, 2), (6, 2), (8, 2), (6, 1), (4, 3)]:
        key = ((3, n_wc), "rowsel3m", 64, n_k, 1, "exact")
        try:
            runner = plan._runners.get(key)
            if runner is None:
                runner = plan._runners[key] = plan._build_runner(*key)
            out, miss = runner(jnp.zeros(grid.volume_shape, jnp.float32))
            float(out.sum())
            m = int(miss)
            best = 1e9
            for _ in range(2):
                t0 = time.perf_counter()
                out, miss = runner(
                    jnp.zeros(grid.volume_shape, jnp.float32)
                )
                float(out.sum())
                best = min(best, time.perf_counter() - t0)
            print(f"  k{n_k} wc{n_wc}: fast {best * 1000:7.1f} ms "
                  f"({n_upd / best / 1e9:5.2f} G)  miss {m:>12,} "
                  f"({m / n_upd:7.2%})", flush=True)
        except Exception as e:
            print(f"  k{n_k} wc{n_wc}: FAILED {type(e).__name__}: "
                  f"{str(e).splitlines()[0][:120]}", flush=True)

    print("== exact rowsel3 (inline remainder) ==", flush=True)
    for n_k, n_wc in [(2, 2), (4, 2), (6, 2), (8, 2)]:
        try:
            kw = dict(mode="rowsel3", view_block=1, window_rows=64,
                      rowsel_passes=n_k, windows=(3, n_wc))
            float(plan.run(jnp.zeros(grid.volume_shape, jnp.float32),
                           **kw).sum())
            best = 1e9
            for _ in range(3):
                t0 = time.perf_counter()
                float(plan.run(jnp.zeros(grid.volume_shape, jnp.float32),
                               **kw).sum())
                best = min(best, time.perf_counter() - t0)
            print(f"  k{n_k} wc{n_wc}: {best * 1000:7.1f} ms  "
                  f"{n_upd / best / 1e9:5.2f} G upd/s", flush=True)
        except Exception as e:
            print(f"  k{n_k} wc{n_wc}: FAILED {type(e).__name__}: "
                  f"{str(e).splitlines()[0][:120]}", flush=True)

    print("== sparse fps: pallas gather vs xla take ==", flush=True)
    import numpy as np

    from cudadepthmapintegration_tpu.core import RayPotential
    from cudadepthmapintegration_tpu.ops.sparse_grid import SparseTSDFGrid
    from cudadepthmapintegration_tpu.testing import (
        orbit_cameras, render_sphere_view,
    )

    p2 = RayPotential(thick=0.04, rho=0.8, eta=0.03, delta=0.16)
    cams = orbit_cameras(48, 4.0, focal=150.0, width=256, image_height=192)
    sviews = [render_sphere_view(c, 256, 192) for c in cams]
    for backend in ("xla", "pallas"):
        try:
            sparse = SparseTSDFGrid(voxel_size=0.02, params=p2,
                                    pixel_stride=4, gather_backend=backend)
            for v in sviews:  # warm: allocate + compile buckets
                sparse.integrate_frame(v)
            float(sparse.pool.sum())
            t0 = time.perf_counter()
            for v in sviews:
                sparse.integrate_frame(v)
            float(sparse.pool.sum())
            dt = time.perf_counter() - t0
            print(f"  {backend:6s}: {len(sviews) / dt:6.1f} fps "
                  f"({dt / len(sviews) * 1000:6.2f} ms/frame, "
                  f"{sparse.num_allocated} blocks)", flush=True)
        except Exception as e:
            print(f"  {backend:6s}: FAILED {type(e).__name__}: "
                  f"{str(e).splitlines()[0][:140]}", flush=True)
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
