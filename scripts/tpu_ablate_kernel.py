"""One-session kernel diagnostics: drift localization + component ablation.

Part A — exactness at FIXED view_block. The probe's rowsel-vs-rowsel3
checksum drift (8.7e-08) is hypothesized to be the VMEM clamp changing vb
(4 -> 1) and therefore the fp32 accumulation ORDER across grid steps, not
the split-plane gather. Test: rowsel vb1 vs rowsel3 vb1 must be
BIT-IDENTICAL; rowsel vb4 vs rowsel vb1 should reproduce the drift.

Part B — where does the time go? Monkeypatches ``_gather_pixels_multi``
with reduced variants (WRONG results, timing only) to decompose the sweep:

  proj    projection + potential + accumulate (gather entirely stubbed)
  anchor  + rowmin / v0 / u0 footprint reductions
  passes  + one-hot select passes (dots + lane gathers), no remainder
  full    + remainder reductions and zero-iteration walks  (= the kernel)

Part C — rowsel3 with vb2 under a relaxed depth-VMEM budget (12 MiB).

Run ALONE (one JAX process at a time on this rig); prints incrementally.
"""

import sys
import time

sys.path.insert(0, ".")

import jax
import jax.numpy as jnp

sys.argv = [sys.argv[0]]
import bench  # noqa: E402  (workload builder + compile cache config)

from cudadepthmapintegration_tpu.kernels import integrate_pallas as KP

pl = KP.pl


def timed(plan, grid, nv, reps=3, **kw):
    out = plan.run(jnp.zeros(grid.volume_shape, jnp.float32), **kw)
    float(out.sum())
    best = 1e9
    for _ in range(reps):
        t0 = time.perf_counter()
        float(plan.run(jnp.zeros(grid.volume_shape, jnp.float32), **kw).sum())
        best = min(best, time.perf_counter() - t0)
    return grid.num_cells * nv / best, best


def fresh_plan(grid, views, params):
    return bench.OrientedFusionPlan(grid, views, params, subtile_rows=64)


# ---------------------------------------------------------------- variants
REAL_GPM = KP._gather_pixels_multi


def gp_proj(planes, ui, vi, valid, *, hp, wp, wr, n_wc, n_k, sum_planes=False, **kw):
    n_out = 1 if sum_planes else len(planes)
    return tuple(jnp.zeros(valid.shape, jnp.float32) for _ in range(n_out))


def gp_anchor(planes, ui, vi, valid, *, hp, wp, wr, n_wc, n_k, sum_planes=False, **kw):
    big = jnp.int32(1 << 30)
    rowmin = jnp.min(jnp.where(valid, vi, big), axis=1, keepdims=True)
    v_lo = jnp.min(rowmin)
    u_lo = jnp.min(jnp.where(valid, ui, big))
    v0 = jnp.clip((v_lo // 8) * 8, 0, hp - wr)
    u0 = jnp.clip((u_lo // 128) * 128, 0, wp - 128 * n_wc)
    z = (v0 + u0 + rowmin[0, 0]).astype(jnp.float32) * 0.0  # keep alive
    n_out = 1 if sum_planes else len(planes)
    return tuple(
        jnp.zeros(valid.shape, jnp.float32) + z for _ in range(n_out)
    )


def gp_passes(planes, ui, vi, valid, *, hp, wp, wr, n_wc, n_k, sum_planes=False, **kw):
    big = jnp.int32(1 << 30)
    rowmin = jnp.min(jnp.where(valid, vi, big), axis=1, keepdims=True)
    v_lo = jnp.min(rowmin)
    u_lo = jnp.min(jnp.where(valid, ui, big))
    v0 = jnp.clip((v_lo // 8) * 8, 0, hp - wr)
    u0 = jnp.clip((u_lo // 128) * 128, 0, wp - 128 * n_wc)
    vi_loc = vi - v0
    rmin = rowmin - v0
    n_out = 1 if sum_planes else len(planes)
    ds_ = tuple(jnp.zeros(valid.shape, jnp.float32) for _ in range(n_out))
    for c in range(n_wc):
        cs = pl.multiple_of(u0 + 128 * c, 128)
        wins = [
            p[pl.ds(pl.multiple_of(v0, 8), wr), pl.ds(cs, 128)]
            for p in planes
        ]
        u_loc = jnp.clip(ui - cs, 0, 127)
        sel_c = valid & (ui >= cs) & (ui < cs + 128)
        for k in range(n_k):
            if sum_planes:
                d0, _ = KP._rowsel_pass_sum(
                    wins, rmin + k, vi_loc, u_loc, sel_c, ds_[0], wr
                )
                ds_ = (d0,)
            else:
                ds_, _ = KP._rowsel_pass(
                    wins, rmin + k, vi_loc, u_loc, sel_c, ds_, wr
                )
    return ds_


def main():
    grid, views, params = bench.build_workload()
    nv = len(views)
    print("== Part A: exactness at fixed vb ==", flush=True)
    outs = {}
    for label, mode, vb in [
        ("rowsel  vb1", "rowsel", 1),
        ("rowsel3 vb1", "rowsel3", 1),
        ("rowsel  vb4", "rowsel", 4),
    ]:
        plan = fresh_plan(grid, views, params)
        # plan.run donates its volume argument: fresh zeros per call.
        out = plan.run(jnp.zeros(grid.volume_shape, jnp.float32),
                       mode=mode, view_block=vb,
                       window_rows=64, rowsel_passes=2)
        outs[label] = out
        print(f"  {label}: checksum {float(out.sum()):+.9e}", flush=True)
    a, b, c = outs["rowsel  vb1"], outs["rowsel3 vb1"], outs["rowsel  vb4"]
    n_ab = int(jnp.sum(a != b))
    mx_ab = float(jnp.max(jnp.abs(a - b)))
    n_ac = int(jnp.sum(a != c))
    mx_ac = float(jnp.max(jnp.abs(a - c)))
    print(f"  rowsel-vb1 vs rowsel3-vb1: {n_ab} mismatches, max|d|={mx_ab:.3e}"
          f"  {'BIT-IDENTICAL' if n_ab == 0 else 'DIFFER'}", flush=True)
    print(f"  rowsel-vb1 vs rowsel-vb4 : {n_ac} mismatches, max|d|={mx_ac:.3e}"
          "  (expected: tiny, vb accumulation order)", flush=True)
    del outs, a, b, c

    print("== Part B: ablation timing (rowsel3 vb1; timings only) ==",
          flush=True)
    prev = None
    for label, fn in [
        ("proj  ", gp_proj),
        ("anchor", gp_anchor),
        ("passes", gp_passes),
        ("full  ", REAL_GPM),
    ]:
        KP._gather_pixels_multi = fn
        try:
            plan = fresh_plan(grid, views, params)
            ups, dt = timed(plan, grid, nv, mode="rowsel3", view_block=1,
                            window_rows=64, rowsel_passes=2)
            delta = "" if prev is None else f"  (+{(dt - prev) * 1000:6.1f} ms)"
            print(f"  {label}: {dt * 1000:7.1f} ms  {ups / 1e9:5.2f} G upd/s"
                  f"{delta}", flush=True)
            prev = dt
        except Exception as e:
            print(f"  {label}: FAILED {type(e).__name__}: "
                  f"{str(e).splitlines()[0][:120]}", flush=True)
        finally:
            KP._gather_pixels_multi = REAL_GPM

    print("== Part C: rowsel3 vb2 (depth-VMEM budget 12 MiB) ==", flush=True)
    KP.DEPTH_VMEM_BUDGET = 12 << 20
    try:
        plan = fresh_plan(grid, views, params)
        ups, dt = timed(plan, grid, nv, mode="rowsel3", view_block=2,
                        window_rows=64, rowsel_passes=2)
        print(f"  rowsel3 vb2: {dt * 1000:7.1f} ms  {ups / 1e9:5.2f} G upd/s",
              flush=True)
    except Exception as e:
        print(f"  rowsel3 vb2: FAILED {type(e).__name__}: "
              f"{str(e).splitlines()[0][:120]}", flush=True)
    finally:
        KP.DEPTH_VMEM_BUDGET = 8 << 20
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
