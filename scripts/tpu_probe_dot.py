"""Probe: how much of the rowsel kernel's time is the one-hot select dot?

Times the 512^3 x 32-view config across matmul precisions of the row-select
dot (HIGHEST = exact 24-bit, HIGH/DEFAULT = mantissa-truncating DIAGNOSTIC
ONLY — their checksums are EXPECTED to drift) and across column-window
counts. If DEFAULT/HIGH are much faster, the dot dominates and an exact
3-plane bf16 split (same MXU rows as HIGH, exact like HIGHEST) is the win.

Run alone (one JAX process at a time on this rig).
"""

import sys
import time

sys.path.insert(0, ".")

import jax
import jax.numpy as jnp

sys.argv = [sys.argv[0]]
import bench  # noqa: E402  (reuses workload builder + compile cache config)

from cudadepthmapintegration_tpu.kernels import integrate_pallas as KP


def run(plan, grid, nv, reps=3, **kw):
    out = plan.run(jnp.zeros(grid.volume_shape, jnp.float32), **kw)
    checksum = float(out.sum())
    best = 1e9
    for _ in range(reps):
        t0 = time.perf_counter()
        float(plan.run(jnp.zeros(grid.volume_shape, jnp.float32), **kw).sum())
        best = min(best, time.perf_counter() - t0)
    return grid.num_cells * nv / best, best, checksum


def main():
    grid, views, params = bench.build_workload()
    nv = len(views)
    P = jax.lax.Precision
    variants = [
        # label, mode, precision, run kwargs
        ("rowsel  HIGHEST k2 wc2 vb4", "rowsel", P.HIGHEST,
         dict(window_rows=64, rowsel_passes=2, view_block=4)),
        # NOTE: Mosaic supports only DEFAULT and HIGHEST dot precisions.
        ("rowsel  DEFAULT k2 wc2 vb4", "rowsel", P.DEFAULT,
         dict(window_rows=64, rowsel_passes=2, view_block=4)),
        ("rowsel3         k2 wc2 vb4", "rowsel3", P.HIGHEST,
         dict(window_rows=64, rowsel_passes=2, view_block=4)),
        ("rowsel3         k2 wc2 vb1", "rowsel3", P.HIGHEST,
         dict(window_rows=64, rowsel_passes=2, view_block=1)),
        ("rowsel3         k2 wc1 vb4", "rowsel3", P.HIGHEST,
         dict(window_rows=64, rowsel_passes=2, view_block=4, windows=(3, 1))),
        ("rowsel  HIGHEST k2 wc1 vb4", "rowsel", P.HIGHEST,
         dict(window_rows=64, rowsel_passes=2, view_block=4, windows=(3, 1))),
        ("rowsel  HIGHEST k1 wc2 vb4", "rowsel", P.HIGHEST,
         dict(window_rows=64, rowsel_passes=1, view_block=4)),
    ]
    ref = None
    for label, mode, prec, run_kw in variants:
        KP.ROWSEL_PRECISION = prec
        # Fresh plan per variant: runner caches close over the precision
        # global at trace time.
        plan = bench.OrientedFusionPlan(grid, views, params, subtile_rows=64)
        try:
            ups, dt, checksum = run(plan, grid, nv, mode=mode, **run_kw)
        except Exception as e:  # keep probing the remaining variants
            print(f"{label:28s} FAILED: {type(e).__name__}: "
                  f"{str(e).splitlines()[0][:120]}", flush=True)
            continue
        if ref is None:
            ref = checksum
        drift = abs(checksum - ref) / max(abs(ref), 1.0)
        print(f"{label:28s} {ups/1e9:6.2f} G upd/s  ({dt*1000:7.1f} ms)"
              f"  checksum drift {drift:.2e}", flush=True)
    KP.ROWSEL_PRECISION = P.HIGHEST
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
