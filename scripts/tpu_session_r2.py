"""One-process TPU session: coloration kernel check + integrate timing +
full bench. Single process because back-to-back JAX processes stall this
rig's tunnel (see CLAUDE.md)."""

import sys
import time

sys.path.insert(0, ".")
sys.path.insert(0, "scripts")

import jax.numpy as jnp
import numpy as np


def main():
    print("== [1/3] integrate kernel timing after reduction micro-opts ==",
          flush=True)
    import bench

    grid, views, params = bench.build_workload()
    from cudadepthmapintegration_tpu.kernels.integrate_pallas import (
        OrientedFusionPlan,
    )

    plan = OrientedFusionPlan(grid, views, params, subtile_rows=64)
    for nk, vb in ((2, 1), (2, 2), (2, 4), (3, 2)):
        kw = dict(mode="rowsel", window_rows=64, rowsel_passes=nk,
                  view_block=vb)
        out = plan.run(jnp.zeros(grid.volume_shape, jnp.float32), **kw)
        float(out.sum())
        best = 1e9
        for _ in range(3):
            t0 = time.perf_counter()
            float(plan.run(jnp.zeros(grid.volume_shape, jnp.float32),
                           **kw).sum())
            best = min(best, time.perf_counter() - t0)
        ups = grid.num_cells * len(views) / best
        print(f"rowsel wr64 k{nk} vb{vb} sj64 (opt): {ups/1e9:6.2f} G upd/s "
              f"({best*1e3:7.1f} ms)", flush=True)

    print("== [2/3] full bench ==", flush=True)
    rc3 = bench.main()

    print("== [3/3] coloration kernel parity + gather micro-bench ==",
          flush=True)
    import tpu_coloration_bench

    rc1 = tpu_coloration_bench.main()
    return rc1 or rc3


if __name__ == "__main__":
    raise SystemExit(main())
