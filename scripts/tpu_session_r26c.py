"""TPU session r2.6c: z_block (kz) sweep at three grid sizes + the
coloration cost-floor probes. One process (tunnel discipline, CLAUDE.md).

Order: 512^3 kz1 first (validates the restructured kernel's default
lowering and re-baselines), then kz2/kz4, then 256^3 and 1024^3, then
the coloration probes — so a late Mosaic hang cannot eat the kz data.
"""

import sys
import time

sys.path.insert(0, ".")
sys.path.insert(0, "scripts")

import jax.numpy as jnp

import bench  # noqa: E402


def timed(plan, grid, nv, reps=3, **run_kw):
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


def kz_sweep():
    # Per-size (k, kz) grid. Coverage-sim prediction (coverage_sim.py):
    # per-row v-span scales with VOXEL SIZE (tilt px/voxel), so k6 miss is
    # 31.8% @256^3 / 14.8% @512^3 / 4.3% @1024^3 -> per-size optimum k is
    # ~10 / 6 / 4. kz divides the per-step depth-block DMA; bit-identical.
    # Measured 2026-08-18 (first run of this script): 512^3 k6 kz1 4.89 G,
    # kz2 4.88 G (no win), kz4 VMEM-OOM (scoped 22M > 16M limit) — kz>2
    # overflows the Mosaic scoped-vmem stack, so it is dropped below and
    # every variant is try/except-guarded so one failure can't eat the rest.
    base = dict(mode="rowsel3", window_rows=64)
    for label, dims, n_views, variants in (
        ("512^3 x 32", 513, 32, ((6, 1), (6, 2))),
        ("256^3 x 32", 257, 32, ((6, 1), (10, 1), (10, 2))),
        ("1024^3 x 16", 1025, 16, ((6, 1), (4, 1), (4, 2))),
    ):
        grid, views, params = bench.build_workload(dims=dims, n_views=n_views)
        plan = bench.OrientedFusionPlan(grid, views, params, subtile_rows=64)
        print(f"-- {label} --", flush=True)
        ref = {}
        for k, kz in variants:
            try:
                ups, dt, checksum = timed(
                    plan, grid, n_views, rowsel_passes=k, z_block=kz, **base
                )
            except Exception as e:  # compile OOM / Mosaic 500: keep sweeping
                print(f"  rowsel3 k{k:<2} kz{kz:<2} FAILED: {str(e)[:120]}",
                      flush=True)
                continue
            # kz variants at fixed k are bit-identical; different k only
            # changes pass/walk split, also exact -> same bits.
            tag = "" if checksum == ref.setdefault(0, checksum) else (
                "  CHECKSUM MISMATCH!"
            )
            print(
                f"  rowsel3 k{k:<2} kz{kz:<2} {ups/1e9:6.2f} G upd/s "
                f"({dt*1000:7.1f} ms){tag}",
                flush=True,
            )


def main():
    print("== [1/3] z_block x passes sweep ==", flush=True)
    kz_sweep()
    print("== [2/3] coloration floor probes ==", flush=True)
    import tpu_coloration_bench

    rc = tpu_coloration_bench.main()
    print("== [3/3] full bench ==", flush=True)
    rc2 = bench.main()
    return rc or rc2


if __name__ == "__main__":
    raise SystemExit(main())
