"""Hardware validation + timing of the miss-tracking kernel modes.

1. Throughput @512^3 x 32 of rowsel3m / rowselm vs the exact modes.
2. On-device bit-equality: rowsel3m vs rowsel3 (vb1) + miss count.
3. The 5-case parity gate (scripts/tpu_validate.py) in mode=rowsel3m —
   exercises the exact re-dispatch on whatever geometry actually misses.
4. Bench configs 256^3 x 32 and 1024^3 x 16 in rowsel3m.

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

from cudadepthmapintegration_tpu.kernels import integrate_pallas as KP


def timed(plan, grid, nv, reps=3, **kw):
    float(plan.run(jnp.zeros(grid.volume_shape, jnp.float32), **kw).sum())
    best = 1e9
    for _ in range(reps):
        t0 = time.perf_counter()
        float(plan.run(jnp.zeros(grid.volume_shape, jnp.float32), **kw).sum())
        best = min(best, time.perf_counter() - t0)
    return grid.num_cells * nv / best, best


def main():
    grid, views, params = bench.build_workload()
    nv = len(views)
    kw = dict(window_rows=64, rowsel_passes=2)

    print("== throughput @512^3 x 32 ==", flush=True)
    plan = bench.OrientedFusionPlan(grid, views, params, subtile_rows=64)
    for label, mode, vb in [
        ("rowsel3m vb1", "rowsel3m", 1),
        ("rowselm  vb1", "rowselm", 1),
        ("rowselm  vb4", "rowselm", 4),
    ]:
        try:
            ups, dt = timed(plan, grid, nv, mode=mode, view_block=vb, **kw)
            print(f"  {label}: {dt * 1000:7.1f} ms  {ups / 1e9:5.2f} G upd/s"
                  f"  last_miss={plan.last_miss}", flush=True)
        except Exception as e:
            print(f"  {label}: FAILED {type(e).__name__}: "
                  f"{str(e).splitlines()[0][:120]}", flush=True)

    print("== bit-equality rowsel3m vs rowsel3 (vb1) ==", flush=True)
    a = plan.run(jnp.zeros(grid.volume_shape, jnp.float32),
                 mode="rowsel3", view_block=1, **kw)
    b = plan.run(jnp.zeros(grid.volume_shape, jnp.float32),
                 mode="rowsel3m", view_block=1, **kw)
    n = int(jnp.sum(a != b))
    print(f"  mismatches: {n}  miss={plan.last_miss}  "
          f"{'BIT-IDENTICAL' if n == 0 else 'DIFFER'}", flush=True)
    del a, b

    print("== 5-case parity gate (mode=rowsel3m) ==", flush=True)
    ok, max_flip = tpu_validate.run_parity(
        verbose=True, subtile_rows=64, mode="rowsel3m", **kw
    )
    print(f"  parity ok={ok} max_flip={max_flip:.2e}", flush=True)

    print("== other bench configs (rowsel3m vb1) ==", flush=True)
    for dims, n_views in ((257, 32), (1025, 16)):
        g2, v2, p2 = bench.build_workload(dims=dims, n_views=n_views)
        try:
            plan2 = bench.OrientedFusionPlan(g2, v2, p2, subtile_rows=64)
            ups, dt = timed(plan2, g2, len(v2), reps=2,
                            mode="rowsel3m", view_block=1, **kw)
            print(f"  {dims - 1}^3 x {n_views}: {dt * 1000:7.1f} ms  "
                  f"{ups / 1e9:5.2f} G upd/s  last_miss={plan2.last_miss}",
                  flush=True)
            del plan2
        except Exception as e:
            print(f"  {dims - 1}^3: FAILED {type(e).__name__}: "
                  f"{str(e).splitlines()[0][:140]}", flush=True)
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
