"""Round-3 hardware session: every TPU measurement batched in ONE process
(tunnel discipline, CLAUDE.md).

Phases (argv filter; default all, in this order):
  hbm    - HBM-resident depth modes: map-size ladder to 1920x1080, parity
           vs the XLA integrator, and the VMEM-vs-HBM cost at small sizes.
  autok  - per-group adaptive pass counts on the bench sizes + a mixed rig;
           per-group miss re-dispatch on the mixed rig.
  cull   - frustum-culled sharded staging on the narrow side-scan rig
           (delegates to scripts/tpu_sharded_probe.py rows).
  color  - coloration kernel view_block ladder (the round-2.6 floor's
           untried lever).
  gate   - the standard 6-case hardware parity gate at shipping defaults.
"""

import sys
import time

sys.path.insert(0, ".")

import jax.numpy as jnp
import numpy as np

from cudadepthmapintegration_tpu.core import RayPotential, VoxelGrid
from cudadepthmapintegration_tpu.kernels.integrate_pallas import (
    OrientedFusionPlan,
)
from cudadepthmapintegration_tpu.testing import (
    orbit_cameras,
    render_sphere_view,
)

PARAMS = RayPotential(thick=0.025, rho=0.8, eta=0.03, delta=0.1)


def banner(s):
    print(f"\n=== {s} ===", flush=True)


def orbit_views(w, h, n_views, focal=None, radius=4.0, height=None):
    kw = dict(focal=focal or (0.6 * w), width=w, image_height=h)
    if height is not None:
        kw["height"] = height
    cams = orbit_cameras(n_views, radius, **kw)
    return [render_sphere_view(c, w, h, radius=1.0, background=-1.0)
            for c in cams]


def cube_grid(dims):
    return VoxelGrid(dims=(dims,) * 3, origin=(-1.6,) * 3,
                     spacing=(3.2 / (dims - 1),) * 3)


def time_plan(plan, grid, n_views, reps=3, **kw):
    checksum = float(
        plan.run(jnp.zeros(grid.volume_shape, jnp.float32), **kw).sum()
    )
    best = 1e9
    for _ in range(reps):
        t0 = time.perf_counter()
        checksum = float(
            plan.run(jnp.zeros(grid.volume_shape, jnp.float32), **kw).sum()
        )
        best = min(best, time.perf_counter() - t0)
    return grid.num_cells * n_views / best, best, checksum


def xla_checksum(grid, views, params):
    from cudadepthmapintegration_tpu.ops import integrate as I

    t = I.projection_tables(grid, views, np.float32)
    depths = np.stack([v.depth for v in views]).astype(np.float32)
    h, w = views[0].depth.shape
    vol = I._integrate_batched(
        jnp.zeros(grid.volume_shape, jnp.float32),
        *[jnp.asarray(a) for a in (t.tx, t.ty, t.tz, t.tc, depths)],
        h=int(h), w=int(w), view_batch=len(views),
        thick=params.thick, rho=params.rho, eta=params.eta,
        delta=params.delta,
    )
    return float(vol.sum())


# ---------------------------------------------------------------------------
def phase_hbm():
    banner("HBM depth modes: size ladder (256^3 x 8 views)")
    rows = [
        (640, 480, "rowsel3"),    # VMEM 3-plane baseline
        (640, 480, "rowsel3h"),   # HBM at the same size: the residency cost
        (1024, 768, "rowsel3"),   # auto-downgrades to 1-plane rowsel (0.82G r2)
        (1024, 768, "rowsel3h"),
        (1280, 960, "rowsel3h"),
        (1600, 1200, "rowsel3"),  # auto-routes to rowsel3h now (was raise)
        (1920, 1080, "rowsel3h"),
        (1920, 1080, "rowselh"),
    ]
    grids = {}
    for w, h, mode in rows:
        key = (w, h)
        if key not in grids:
            grid = cube_grid(257)
            views = orbit_views(w, h, 8)
            plan = OrientedFusionPlan(grid, views, PARAMS, subtile_rows=64)
            grids[key] = (grid, views, plan, None)
        grid, views, plan, _ = grids[key]
        try:
            ups, best, checksum = time_plan(
                plan, grid, 8, mode=mode, window_rows=64, rowsel_passes=6,
            )
            print(f"  {w}x{h} {mode:9s}: {ups / 1e9:6.2f} G upd/s "
                  f"({best * 1e3:7.1f} ms) checksum {checksum:.6g}",
                  flush=True)
            grids[key] = (grid, views, plan, checksum)
        except Exception as e:
            print(f"  {w}x{h} {mode:9s}: FAILED [{type(e).__name__}] "
                  f"{str(e)[:160]}", flush=True)

    banner("HBM parity + speedup vs XLA integrator")
    for w, h in ((1024, 768), (1920, 1080)):
        entry = grids.get((w, h))
        if entry is None or entry[3] is None:
            print(f"  {w}x{h}: no pallas checksum (run failed)", flush=True)
            continue
        grid, views, _, s_pallas = entry
        s_xla = xla_checksum(grid, views, PARAMS)  # warm/compile
        t0 = time.perf_counter()
        s_xla = xla_checksum(grid, views, PARAMS)
        xla_s = time.perf_counter() - t0
        rel = abs(s_pallas - s_xla) / max(abs(s_xla), 1.0)
        print(f"  {w}x{h}: pallas {s_pallas:.6g} vs xla {s_xla:.6g} "
              f"(rel {rel:.2e}) {'OK' if rel < 1e-3 else 'MISMATCH'}; "
              f"xla {grid.num_cells * 8 / xla_s / 1e9:.3f} G "
              f"({xla_s:.2f} s) on the SAME workload", flush=True)

    banner("HBM pixel-level parity gate (2 cases, mode=rowsel3h)")
    import scripts.tpu_validate as tv

    all_cases = tv.parity_cases()
    sub = [all_cases[0], all_cases[5]]  # 64^3 orbit + odd dims 600x456
    orig = tv.parity_cases
    tv.parity_cases = lambda: sub
    try:
        ok, max_flip = tv.run_parity(
            verbose=True, mode="rowsel3h", window_rows=64, rowsel_passes=6,
            subtile_rows=64,
        )
        print(f"  hbm parity: {'PASS' if ok else 'FAIL'} "
              f"(max flip {max_flip:.2e})", flush=True)
    finally:
        tv.parity_cases = orig


# ---------------------------------------------------------------------------
def phase_autok():
    banner("auto-k vs fixed k (bench rigs)")
    for dims, nv, fixed_k in ((513, 32, 6), (257, 32, 10), (1025, 16, 6)):
        grid = cube_grid(dims)
        views = orbit_views(512, 512, nv, focal=300.0)
        plan = OrientedFusionPlan(grid, views, PARAMS, subtile_rows=64)
        for label, k in ((f"k{fixed_k}", fixed_k), ("auto", "auto")):
            try:
                ups, best, checksum = time_plan(
                    plan, grid, nv, mode="rowsel3", window_rows=64,
                    rowsel_passes=k,
                )
                ks = plan.group_passes
                print(f"  {dims - 1}^3 x{nv} {label:5s}: {ups / 1e9:6.2f} G "
                      f"({best * 1e3:7.1f} ms) groups_k={ks} "
                      f"checksum {checksum:.6g}", flush=True)
            except Exception as e:
                print(f"  {dims - 1}^3 x{nv} {label:5s}: FAILED "
                      f"[{type(e).__name__}] {str(e)[:140]}", flush=True)

    banner("mixed rig (16 orbit + 16 top-down, 512^3)")
    grid = cube_grid(513)
    views = (orbit_views(512, 512, 16, focal=300.0)
             + orbit_views(512, 512, 16, focal=300.0, radius=0.8,
                           height=4.0))
    plan = OrientedFusionPlan(grid, views, PARAMS, subtile_rows=64)
    for label, kw in (
        ("k6   ", dict(rowsel_passes=6)),
        ("auto ", dict(rowsel_passes="auto")),
        ("k6 pg-redisp", dict(rowsel_passes=6, mode="rowsel3m",
                              per_group_redispatch=True)),
        ("auto pg-redisp", dict(rowsel_passes="auto", mode="rowsel3m",
                                per_group_redispatch=True)),
    ):
        try:
            ups, best, checksum = time_plan(
                plan, grid, 32, mode=kw.pop("mode", "rowsel3"),
                window_rows=64, **kw,
            )
            extra = (f" miss={plan.last_group_miss}"
                     if "pg" in label else f" groups_k={plan.group_passes}")
            print(f"  mixed {label}: {ups / 1e9:6.2f} G "
                  f"({best * 1e3:7.1f} ms){extra} checksum {checksum:.6g}",
                  flush=True)
        except Exception as e:
            print(f"  mixed {label}: FAILED [{type(e).__name__}] "
                  f"{str(e)[:140]}", flush=True)


# ---------------------------------------------------------------------------
def phase_cull():
    banner("frustum-culled sharded staging (side-scan rig)")
    import scripts.tpu_sharded_probe as sp

    # Reuse the probe's own rows for just the side-scan rig.
    sys.argv = ["tpu_sharded_probe.py", "side-scan"]
    sp.main()


# ---------------------------------------------------------------------------
def phase_color():
    banner("coloration view_block ladder (mesh verts x 64 views, 512^2)")
    import scripts.tpu_coloration_bench as cb
    from cudadepthmapintegration_tpu.kernels.coloration_pallas import (
        _gather_colors_padded,
        _morton_order,
        stage_color_planes,
    )
    from cudadepthmapintegration_tpu.testing import sphere_scene

    nv, w, h = 64, 512, 512
    rng = np.random.default_rng(0)
    views = sphere_scene(n_views=nv, width=w, height=h, focal=300.0)
    for v in views:
        v.color[:] = rng.integers(0, 256, v.color.shape, dtype=np.uint8)
    proj = np.stack([(v.camera.k4 @ v.camera.rt)[:3, :] for v in views])
    colors = np.stack([v.color for v in views])
    pts = cb.sphere_mc_mesh()
    print(f"  mesh verts: {len(pts)}", flush=True)
    staged = stage_color_planes(colors)
    proj12 = jnp.asarray(proj.reshape(nv, 12).astype(np.float32))
    p = pts[_morton_order(pts)]
    sj, tb = 32, 8
    tile = sj * 128
    pad_n = (-len(p)) % (tile * tb)
    pts_pad = np.zeros((len(p) + pad_n, 3), np.float32)
    pts_pad[: len(p)] = p
    nt = len(pts_pad) // tile
    pts_t = jnp.asarray(
        pts_pad.reshape(nt, sj, 128, 3).transpose(0, 3, 1, 2)
        .reshape(nt // tb, tb * 3 * sj, 128)
    )
    ref = None
    for vb in (1, 2, 4):
        kw = dict(h=h, w=w, sj=sj, tb=tb, vb=vb, wr=64, n_wc=2, n_k=2,
                  z_test=False)
        try:
            out = _gather_colors_padded(pts_t, proj12, staged.planes, **kw)
            s = float(out.sum())
            t0 = time.perf_counter()
            s = float(
                _gather_colors_padded(pts_t, proj12, staged.planes,
                                      **kw).sum()
            )
            dt = time.perf_counter() - t0
            g = len(pts) * nv / dt / 1e9
            tag = "" if ref is None or s == ref else "  CHECKSUM-MISMATCH"
            ref = s if ref is None else ref
            print(f"  vb{vb}: {g:5.2f} G samples/s ({dt * 1e3:6.1f} ms) "
                  f"checksum {s:.6g}{tag}", flush=True)
        except Exception as e:
            print(f"  vb{vb}: FAILED [{type(e).__name__}] {str(e)[:140]}",
                  flush=True)


# ---------------------------------------------------------------------------
def phase_gate():
    banner("standard 6-case parity gate (rowsel3 k6)")
    import scripts.tpu_validate as tv

    ok, max_flip = tv.run_parity(
        verbose=True, mode="rowsel3", window_rows=64, rowsel_passes=6,
        subtile_rows=64,
    )
    print(f"  gate: {'ALL PASS' if ok else 'FAILURES'} "
          f"(max flip {max_flip:.2e})", flush=True)


PHASES = {
    "hbm": phase_hbm,
    "autok": phase_autok,
    "cull": phase_cull,
    "color": phase_color,
    "gate": phase_gate,
}


def main():
    args = sys.argv[1:]
    unknown = [a for a in args if a not in PHASES]
    if unknown:
        print(f"unknown phases: {unknown}; known: {list(PHASES)}")
        return 2
    want = args or list(PHASES)
    import jax

    print(f"devices: {jax.devices()}", flush=True)
    for name in want:
        t0 = time.time()
        try:
            PHASES[name]()
        except Exception as e:
            print(f"PHASE {name} CRASHED [{type(e).__name__}] "
                  f"{str(e)[:200]}", flush=True)
        print(f"[phase {name}: {time.time() - t0:.0f}s]", flush=True)
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
