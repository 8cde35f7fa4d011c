"""Band-height sweep for the HBM band-sweep modes (one TPU process).

The band-sweep's main tax is the per-band projection re-run
(n_bands = hp/bv), so taller bands should approach the whole-map rate
until the band block's VMEM cost bites. Measures rowsel3h at
HBM_BAND_CAP in {64, 128, 256} across map sizes (256^3 x 8 views).
"""

import sys
import time

sys.path.insert(0, ".")

import jax.numpy as jnp
import numpy as np

import cudadepthmapintegration_tpu.kernels.integrate_pallas as KP
from cudadepthmapintegration_tpu.core import RayPotential, VoxelGrid
from cudadepthmapintegration_tpu.kernels.integrate_pallas import (
    OrientedFusionPlan,
)
from cudadepthmapintegration_tpu.testing import (
    orbit_cameras,
    render_sphere_view,
)

PARAMS = RayPotential(thick=0.025, rho=0.8, eta=0.03, delta=0.1)


def _measure(plan, grid, label, ref, **kw):
    try:
        checksum = float(plan.run(
            jnp.zeros(grid.volume_shape, jnp.float32), **kw).sum())
        best = 1e9
        for _ in range(3):
            t0 = time.perf_counter()
            checksum = float(plan.run(
                jnp.zeros(grid.volume_shape, jnp.float32), **kw).sum())
            best = min(best, time.perf_counter() - t0)
        ups = grid.num_cells * 8 / best
        tag = "" if ref is None or checksum == ref else "  MISMATCH"
        miss = getattr(plan, "last_miss", None)
        extra = f" miss={miss:.0f}" if kw.get("mode", "").endswith(("d", "w")) \
            and miss is not None else ""
        print(f"  {label}: {ups / 1e9:5.2f} G ({best * 1e3:6.1f} ms) "
              f"checksum {checksum:.6g}{extra}{tag}", flush=True)
        return checksum if ref is None else ref
    except Exception as e:
        print(f"  {label}: FAILED [{type(e).__name__}] {str(e)[:140]}",
              flush=True)
        return ref


def phase_cap(grid):
    for w, h in ((640, 480), (1024, 768), (1920, 1080)):
        cams = orbit_cameras(8, 4.0, focal=0.6 * w, width=w, image_height=h)
        views = [render_sphere_view(c, w, h, radius=1.0, background=-1.0)
                 for c in cams]
        ref = None
        cap0 = KP.HBM_BAND_CAP
        for cap in (64, 128, 256):
            KP.HBM_BAND_CAP = cap
            plan = OrientedFusionPlan(grid, views, PARAMS, subtile_rows=64)
            ref = _measure(
                plan, grid, f"{w}x{h} cap{cap:3d}", ref,
                mode="rowsel3h", window_rows=64, rowsel_passes=6,
            )
        KP.HBM_BAND_CAP = cap0


def phase_dyn(grid):
    """Dynamic 2-band modes vs the band-sweep (the v20 channel's first
    production use — compile time is the open question)."""
    for w, h in ((640, 480), (1024, 768), (1920, 1080)):
        cams = orbit_cameras(8, 4.0, focal=0.6 * w, width=w, image_height=h)
        views = [render_sphere_view(c, w, h, radius=1.0, background=-1.0)
                 for c in cams]
        ref = None
        for mode, cyb in (("rowsel3h", 64), ("rowsel3d", 64),
                          ("rowseld", 64), ("rowsel3d", 256),
                          ("rowseld", 256)):
            KP.DYN_CY_B = cyb
            # Fresh plan per row: the runner cache does not key DYN_CY_B.
            plan = OrientedFusionPlan(grid, views, PARAMS, subtile_rows=64)
            t0 = time.time()
            ref = _measure(
                plan, grid, f"{w}x{h} {mode:9s} cyb{cyb:3d}", ref,
                mode=mode, window_rows=64, rowsel_passes=6,
            )
            print(f"    [total incl compile: {time.time() - t0:.0f}s]",
                  flush=True)
        KP.DYN_CY_B = 64


def phase_win(grid):
    """Windowed band-sweep (rowselw/rowsel3w) vs the plain sweep: the
    per-unit window drops bands a unit cannot touch (VERDICT r3 item 4 —
    the v20 scalar-prefetch channel in production). Sweeps the y-block
    cap (HBW_CY_B): tighter blocks -> tighter windows -> fewer band steps,
    but more band-block re-fetches. miss must stay 0 (window bound holds)
    and checksums bit-match the plain sweep."""
    for w, h in ((640, 480), (1024, 768), (1920, 1080)):
        cams = orbit_cameras(8, 4.0, focal=0.6 * w, width=w, image_height=h)
        views = [render_sphere_view(c, w, h, radius=1.0, background=-1.0)
                 for c in cams]
        ref = None
        cyb0 = KP.HBW_CY_B
        for mode, cyb in (("rowsel3h", 128), ("rowsel3w", 320),
                          ("rowsel3w", 128), ("rowsel3w", 64),
                          ("rowselw", 128), ("rowselh", 128)):
            KP.HBW_CY_B = cyb
            # Fresh plan per row: the runner cache does not key HBW_CY_B.
            plan = OrientedFusionPlan(grid, views, PARAMS, subtile_rows=64)
            t0 = time.time()
            ref = _measure(
                plan, grid, f"{w}x{h} {mode:9s} cyb{cyb:3d}", ref,
                mode=mode, window_rows=64, rowsel_passes=6,
            )
            wins = getattr(plan, "group_band_windows", None)
            miss = getattr(plan, "last_miss", None)
            print(f"    [total incl compile: {time.time() - t0:.0f}s "
                  f"windows={wins} miss={miss}]", flush=True)
        KP.HBW_CY_B = cyb0


def phase_cap2(grid):
    """Band caps ABOVE 256: the round-3 sweep ({64,128,256}) was monotone
    in favor of taller bands but stopped at 256. The VMEM budget still
    auto-clamps (3-plane at wide maps), so only the single-plane modes
    can actually get taller — at 640-wide, cap512 makes the whole padded
    map ONE band (the whole-map VMEM rate with HBM staging)."""
    for w, h in ((640, 480), (1024, 768), (1920, 1080)):
        cams = orbit_cameras(8, 4.0, focal=0.6 * w, width=w, image_height=h)
        views = [render_sphere_view(c, w, h, radius=1.0, background=-1.0)
                 for c in cams]
        ref = None
        cap0 = KP.HBM_BAND_CAP
        for mode, cap in (("rowselh", 256), ("rowselh", 512),
                          ("rowselh", 1024), ("rowsel3h", 512),
                          ("rowselw", 512), ("rowsel3w", 512)):
            KP.HBM_BAND_CAP = cap
            plan = OrientedFusionPlan(grid, views, PARAMS, subtile_rows=64)
            t0 = time.time()
            ref = _measure(
                plan, grid, f"{w}x{h} {mode:9s} cap{cap:4d}", ref,
                mode=mode, window_rows=64, rowsel_passes=6,
            )
            wins = getattr(plan, "group_band_windows", None)
            print(f"    [total incl compile: {time.time() - t0:.0f}s "
                  f"windows={wins}]", flush=True)
        KP.HBM_BAND_CAP = cap0


def phase_hdk(grid):
    """Pass-count sweep for the HD band sweep: the k6 default came from
    the WHOLE-map 512^2 sweep, but a band clips each unit's rows to the
    band height, changing the span-vs-pass economics; 1080p spends its
    time in per-band gather/select work (cap2 analysis), so fewer passes
    may win there."""
    w, h = 1920, 1080
    cams = orbit_cameras(8, 4.0, focal=0.6 * w, width=w, image_height=h)
    views = [render_sphere_view(c, w, h, radius=1.0, background=-1.0)
             for c in cams]
    plan = OrientedFusionPlan(grid, views, PARAMS, subtile_rows=64)
    ref = None
    for k in (2, 4, 6, 8):
        t0 = time.time()
        ref = _measure(
            plan, grid, f"{w}x{h} rowselh k{k}", ref,
            mode="rowselh", window_rows=64, rowsel_passes=k,
        )
        print(f"    [total incl compile: {time.time() - t0:.0f}s]",
              flush=True)


def phase_hdw(grid):
    """Column-window sweep at 1080p: the wc2 default came from the 512^2
    coverage sweep (wc1->wc2 cut miss 34%->14%), but u-spans scale with
    focal ~ 0.6*w — at 1920-wide the footprint spans ~2x the columns, so
    a third/fourth column window may rescue pairs from the remainder
    walk (the measured 1080p sink; pass counts are flat there)."""
    w, h = 1920, 1080
    cams = orbit_cameras(8, 4.0, focal=0.6 * w, width=w, image_height=h)
    views = [render_sphere_view(c, w, h, radius=1.0, background=-1.0)
             for c in cams]
    plan = OrientedFusionPlan(grid, views, PARAMS, subtile_rows=64)
    ref = None
    for wc in (2, 3, 4):
        t0 = time.time()
        ref = _measure(
            plan, grid, f"{w}x{h} rowselh wc{wc}", ref,
            mode="rowselh", window_rows=64, rowsel_passes=6,
            windows=(3, wc),
        )
        print(f"    [total incl compile: {time.time() - t0:.0f}s]",
              flush=True)


def phase_hd1024(_grid):
    """North-star grid with HD imagery: 1024^3 cells x 16 views of
    1920x1080 through the band-sweep (both plane layouts)."""
    grid = VoxelGrid(dims=(1025,) * 3, origin=(-1.6,) * 3,
                     spacing=(3.2 / 1024,) * 3)
    w, h = 1920, 1080
    cams = orbit_cameras(16, 4.0, focal=0.6 * w, width=w, image_height=h)
    views = [render_sphere_view(c, w, h, radius=1.0, background=-1.0)
             for c in cams]
    plan = OrientedFusionPlan(grid, views, PARAMS, subtile_rows=64)
    ref = None
    for mode in ("rowselh", "rowsel3h"):
        try:
            kw = dict(mode=mode, window_rows=64, rowsel_passes=6)
            checksum = float(plan.run(
                jnp.zeros(grid.volume_shape, jnp.float32), **kw).sum())
            best = 1e9
            for _ in range(2):
                t0 = time.perf_counter()
                checksum = float(plan.run(
                    jnp.zeros(grid.volume_shape, jnp.float32), **kw).sum())
                best = min(best, time.perf_counter() - t0)
            ups = grid.num_cells * 16 / best
            tag = "" if ref is None or checksum == ref else "  MISMATCH"
            ref = checksum if ref is None else ref
            print(f"  1024^3x16 @1920x1080 {mode:9s}: {ups / 1e9:5.2f} G "
                  f"({best:6.1f} s) checksum {checksum:.6g}{tag}",
                  flush=True)
        except Exception as e:
            print(f"  1024^3x16 {mode}: FAILED [{type(e).__name__}] "
                  f"{str(e)[:160]}", flush=True)


def main():
    import jax

    print(f"devices: {jax.devices()}", flush=True)
    grid = VoxelGrid(dims=(257,) * 3, origin=(-1.6,) * 3,
                     spacing=(3.2 / 256,) * 3)
    phases = {"cap": phase_cap, "dyn": phase_dyn, "hd1024": phase_hd1024,
              "win": phase_win, "cap2": phase_cap2, "hdk": phase_hdk,
              "hdw": phase_hdw}
    want = [a for a in sys.argv[1:] if a in phases] or ["cap"]
    for name in want:
        phases[name](grid)
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
