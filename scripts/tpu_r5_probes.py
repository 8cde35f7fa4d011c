"""Round-5 hardware probes (one TPU process; CLAUDE.md tunnel rules).

1. HD image-transpose (VERDICT r4 item 4): serve 1920x1080 maps
   transposed (OrientedFusionPlan(transpose_maps=True)) on the 0.37 G
   probe geometry (256^3 x 8 views, focal=0.6*w — the round-4 band-probe
   rig) and on 1024x768. The one untried structural axis for the real-HD
   floor: bands then cut the 1920 axis and the lane axis is 1080 wide.
2. 256^3 window-column / anchor sweep (item 5): n_wc x anchors at the
   bench 256^3 x 32 workload, k10. If nothing beats the default, declare
   the 256^3 floor.
3. Streamed-regime group-fill (item 2): fuse the SAME 32 views at 512^3
   as (a) four pre-staged 8-view plans (the round-4 streamed regime,
   groups padded 4+4) vs (b) one 32-view plan (what group_fill=32 flushes
   after four 8-view arrivals). Device-resident steady state, values
   cross-checked.

Each phase prints G upd/s + checksums; failures print and continue.
"""

import sys
import time

sys.path.insert(0, ".")

import os as _os
_os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/root/.jax_bench_cache")

import jax.numpy as jnp
import numpy as np

from cudadepthmapintegration_tpu.core import RayPotential, VoxelGrid
from cudadepthmapintegration_tpu.kernels.integrate_pallas import (
    OrientedFusionPlan,
)
from cudadepthmapintegration_tpu.testing import orbit_cameras, render_sphere_view

PARAMS = RayPotential(thick=0.025, rho=0.8, eta=0.03, delta=0.1)


def log(msg):
    print(msg, flush=True)


def bench_plan(plan, grid, n_views, reps=3, **kw):
    checksum = float(plan.run(
        jnp.zeros(grid.volume_shape, jnp.float32), **kw).sum())
    best = 1e9
    for _ in range(reps):
        t0 = time.perf_counter()
        checksum = float(plan.run(
            jnp.zeros(grid.volume_shape, jnp.float32), **kw).sum())
        best = min(best, time.perf_counter() - t0)
    return grid.num_cells * n_views / best / 1e9, best, checksum


def phase_hd_transpose():
    log("=== phase 1: HD image-transpose ===")
    grid = VoxelGrid(dims=(257,) * 3, origin=(-1.63, -1.61, -1.59),
                     spacing=(3.2 / 256,) * 3)
    for w, h in ((1920, 1080), (1024, 768)):
        cams = orbit_cameras(8, 4.0, focal=0.6 * w, width=w, image_height=h)
        views = [render_sphere_view(c, w, h, radius=1.0, background=-1.0)
                 for c in cams]
        ref = None
        for tr in (False, True):
            for mode in ("rowsel", "rowsel3h"):
                try:
                    plan = OrientedFusionPlan(grid, views, PARAMS,
                                              subtile_rows=64,
                                              transpose_maps=tr)
                    g, best, cs = bench_plan(
                        plan, grid, 8, mode=mode, window_rows=64,
                        rowsel_passes=6)
                    tag = ""
                    if ref is None:
                        ref = cs
                    elif abs(cs - ref) > 1e-3 * max(abs(ref), 1.0):
                        tag = "  VALUE-MISMATCH"
                    log(f"  {w}x{h} transpose={int(tr)} {mode:9s}: "
                        f"{g:5.2f} G ({best * 1e3:6.1f} ms) "
                        f"checksum {cs:.6g}{tag}")
                except Exception as e:
                    log(f"  {w}x{h} transpose={int(tr)} {mode}: FAILED "
                        f"[{type(e).__name__}] {str(e)[:120]}")


def phase_256_windows():
    log("=== phase 2: 256^3 n_wc/anchor sweep (k10) ===")
    grid = VoxelGrid(dims=(257,) * 3, origin=(-1.6,) * 3,
                     spacing=(3.2 / 256,) * 3)
    cams = orbit_cameras(32, 4.0, focal=300.0, width=512, image_height=512)
    views = [render_sphere_view(c, 512, 512, radius=1.0, background=-1.0)
             for c in cams]
    plan = OrientedFusionPlan(grid, views, PARAMS, subtile_rows=64)
    ref = None
    for anchors in ("exact", "endpoint"):
        for n_wc in (1, 2, 3, 4):
            try:
                g, best, cs = bench_plan(
                    plan, grid, 32, windows=(3, n_wc), mode="rowsel3",
                    window_rows=64, rowsel_passes=10, anchors=anchors)
                tag = ""
                if ref is None:
                    ref = cs
                elif cs != ref:
                    tag = "  MISMATCH"
                log(f"  anchors={anchors:8s} n_wc={n_wc}: {g:5.2f} G "
                    f"({best * 1e3:6.1f} ms) checksum {cs:.6g}{tag}")
            except Exception as e:
                log(f"  anchors={anchors} n_wc={n_wc}: FAILED "
                    f"[{type(e).__name__}] {str(e)[:120]}")


def phase_streamed_fill():
    log("=== phase 3: streamed-regime group fill @512^3 ===")
    grid = VoxelGrid(dims=(513,) * 3, origin=(-1.6,) * 3,
                     spacing=(3.2 / 512,) * 3)
    cams = orbit_cameras(32, 4.0, focal=300.0, width=512, image_height=512)
    views = [render_sphere_view(c, 512, 512, radius=1.0, background=-1.0)
             for c in cams]
    kw = dict(mode="rowsel3", window_rows=64, rowsel_passes=6)

    # (a) round-4 streamed regime: one plan per 8-view arrival.
    plans8 = [OrientedFusionPlan(grid, views[s:s + 8], PARAMS,
                                 subtile_rows=64) for s in range(0, 32, 8)]

    def run8():
        vol = jnp.zeros(grid.volume_shape, jnp.float32)
        for p in plans8:
            vol = p.run(vol, **kw)
        return float(vol.sum())

    cs8 = run8()
    best8 = 1e9
    for _ in range(3):
        t0 = time.perf_counter()
        cs8 = run8()
        best8 = min(best8, time.perf_counter() - t0)
    g8 = grid.num_cells * 32 / best8 / 1e9
    pad8 = [p.groups[i]["tx"].shape[0] for p in plans8
            for i in range(len(p.groups))]
    log(f"  per-8 plans (group sizes {pad8}): {g8:5.2f} G "
        f"({best8 * 1e3:6.1f} ms) checksum {cs8:.6g}")

    # (b) what group_fill=32 flushes: one 32-view plan.
    plan32 = OrientedFusionPlan(grid, views, PARAMS, subtile_rows=64)
    g32, best32, cs32 = bench_plan(plan32, grid, 32, **kw)
    pad32 = [g["tx"].shape[0] for g in plan32.groups]
    rel = abs(cs32 - cs8) / max(abs(cs8), 1.0)
    log(f"  filled 32-view plan (group sizes {pad32}): {g32:5.2f} G "
        f"({best32 * 1e3:6.1f} ms) checksum {cs32:.6g} "
        f"(rel vs per-8 {rel:.2e})")
    log(f"  fill speedup: {best8 / best32:.2f}x")


def main():
    which = sys.argv[1:] or ["warm", "hd", "256", "fill"]
    if "warm" in which:
        t0 = time.perf_counter()
        float(jnp.zeros((8, 128)).sum())  # session-setup throwaway op
        log(f"warmup {time.perf_counter() - t0:.1f}s")
    if "hd" in which:
        phase_hd_transpose()
    if "256" in which:
        phase_256_windows()
    if "fill" in which:
        phase_streamed_fill()
    log("ALL DONE")


if __name__ == "__main__":
    main()
