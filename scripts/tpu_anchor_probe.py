"""Endpoint-anchor probe: do two static lane slices beat the per-row
masked reductions? (anchors='endpoint' vs 'exact', k6 defaults.)

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

    print("== exact-mode timing @512^3 x 32 (rowsel3 k6 wc2) ==", flush=True)
    for anchors in ("exact", "endpoint"):
        try:
            kw = dict(mode="rowsel3", window_rows=64, rowsel_passes=6,
                      anchors=anchors)
            float(plan.run(jnp.zeros(grid.volume_shape, jnp.float32),
                           **kw).sum())
            best = 1e9
            for _ in range(3):
                t0 = time.perf_counter()
                float(plan.run(jnp.zeros(grid.volume_shape, jnp.float32),
                               **kw).sum())
                best = min(best, time.perf_counter() - t0)
            print(f"  {anchors:9s}: {best * 1000:7.1f} ms  "
                  f"{n_upd / best / 1e9:5.2f} G upd/s", flush=True)
        except Exception as e:
            print(f"  {anchors:9s}: FAILED {type(e).__name__}: "
                  f"{str(e).splitlines()[0][:120]}", flush=True)

    print("== coverage loss (rowsel3m k6: miss count) ==", flush=True)
    for anchors in ("exact", "endpoint"):
        try:
            key = ((3, 2), "rowsel3m", 64, 6, 1, anchors)
            runner = plan._runners.get(key)
            if runner is None:
                runner = plan._runners[key] = plan._build_runner(*key)
            out, miss = runner(jnp.zeros(grid.volume_shape, jnp.float32))
            float(out.sum())
            m = int(miss)
            print(f"  {anchors:9s}: miss {m:>12,} ({m / n_upd:7.2%})",
                  flush=True)
        except Exception as e:
            print(f"  {anchors:9s}: FAILED {type(e).__name__}: "
                  f"{str(e).splitlines()[0][:120]}", flush=True)

    print("== 1024^3 x 16 endpoint ==", flush=True)
    try:
        g2, v2, p2 = bench.build_workload(dims=1025, n_views=16)
        plan2 = bench.OrientedFusionPlan(g2, v2, p2, subtile_rows=64)
        kw = dict(mode="rowsel3", window_rows=64, rowsel_passes=6,
                  anchors="endpoint")
        float(plan2.run(jnp.zeros(g2.volume_shape, jnp.float32), **kw).sum())
        best = 1e9
        for _ in range(2):
            t0 = time.perf_counter()
            float(plan2.run(jnp.zeros(g2.volume_shape, jnp.float32),
                            **kw).sum())
            best = min(best, time.perf_counter() - t0)
        n2 = g2.num_cells * 16
        print(f"  {best * 1000:7.1f} ms  {n2 / best / 1e9:5.2f} G upd/s",
              flush=True)
    except Exception as e:
        print(f"  FAILED {type(e).__name__}: "
              f"{str(e).splitlines()[0][:140]}", flush=True)
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
