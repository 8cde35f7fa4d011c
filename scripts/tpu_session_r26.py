"""One-process TPU session (round 2.6): coloration kernel numbers after
the 3-plane fix, then view-block probes at the sizes where per-grid-step
overhead dominates (256^3) or plausibly matters (1024^3).

Single process because back-to-back JAX processes stall this rig's
tunnel (CLAUDE.md). Stages are ordered cheap/cached first so a Mosaic
compile hang late in the run cannot eat the earlier results.
"""

import sys
import time

sys.path.insert(0, ".")
sys.argv = [sys.argv[0]]

import jax.numpy as jnp

import bench  # noqa: E402  (cache config + workload builder)


def timed_plan(plan, grid, nv, reps=3, **run_kw):
    out = plan.run(jnp.zeros(grid.volume_shape, jnp.float32), **run_kw)
    checksum = float(out.sum())
    best = 1e9
    for _ in range(reps):
        t0 = time.perf_counter()
        checksum = float(
            plan.run(jnp.zeros(grid.volume_shape, jnp.float32), **run_kw).sum()
        )
        best = min(best, time.perf_counter() - t0)
    return grid.num_cells * nv / best, best, checksum


def probe_sizes():
    for label, dims, n_views, variants in (
        (
            "256^3 x 32",
            257,
            32,
            [
                ("rowsel3 k6 vb1 (default)",
                 dict(mode="rowsel3", window_rows=64, rowsel_passes=6)),
                ("rowsel  k6 vb4",
                 dict(mode="rowsel", window_rows=64, rowsel_passes=6,
                      view_block=4)),
                ("rowsel  k4 vb4",
                 dict(mode="rowsel", window_rows=64, rowsel_passes=4,
                      view_block=4)),
            ],
        ),
        (
            "1024^3 x 16",
            1025,
            16,
            [
                ("rowsel3 k6 vb1 (default)",
                 dict(mode="rowsel3", window_rows=64, rowsel_passes=6)),
                ("rowsel  k6 vb4",
                 dict(mode="rowsel", window_rows=64, rowsel_passes=6,
                      view_block=4)),
            ],
        ),
    ):
        grid, views, params = bench.build_workload(dims=dims, n_views=n_views)
        plan = bench.OrientedFusionPlan(grid, views, params, subtile_rows=64)
        print(f"-- {label} --", flush=True)
        ref = None
        for name, kw in variants:
            ups, dt, checksum = timed_plan(plan, grid, n_views, **kw)
            if ref is None:
                ref = checksum
            tag = (
                ""
                if abs(checksum - ref) <= 1e-3 * max(abs(ref), 1.0)
                else "  CHECKSUM MISMATCH!"
            )
            print(
                f"  {name:28s} {ups/1e9:6.2f} G upd/s ({dt*1000:7.1f} ms)"
                f"{tag}",
                flush=True,
            )


def main():
    print("== [1/2] coloration kernel (post 3-plane fix) ==", flush=True)
    import tpu_coloration_bench

    rc = tpu_coloration_bench.main()

    print("== [2/2] view-block probes at 256^3 / 1024^3 ==", flush=True)
    probe_sizes()
    return rc


if __name__ == "__main__":
    raise SystemExit(main())
