"""TPU probe: depth-map SIZE ceiling of the Pallas integrate kernel.

rowsel3 stages the full padded (3, hp, wp) split-plane block in VMEM per
view step (double-buffered), so map size — not grid size — is the VMEM
binding: 3*hp*wp*4*2 bytes. Predicted ceiling ~0.7 MP. This probe
measures throughput at VGA-class sizes (incl. the wr32-vs-wr64 window
tuning datum) and records the exact failure mode past the ceiling, to
back the plan-level guard / fallback.

One process (tunnel discipline, CLAUDE.md).
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


def workload(w, h, dims=257, n_views=8, focal=None):
    grid = VoxelGrid(dims=(dims,) * 3, origin=(-1.6,) * 3,
                     spacing=(3.2 / (dims - 1),) * 3)
    cams = orbit_cameras(n_views, 4.0, focal=focal or (0.6 * w),
                         width=w, image_height=h)
    views = [render_sphere_view(c, w, h, radius=1.0, background=-1.0)
             for c in cams]
    return grid, views, RayPotential(thick=0.025, rho=0.8, eta=0.03,
                                     delta=0.1)


def probe(w, h, n_views=8, reps=3, **run_kw):
    grid, views, params = workload(w, h, n_views=n_views)
    plan = OrientedFusionPlan(grid, views, params, subtile_rows=64)
    kw = dict(mode="rowsel3", window_rows=64, rowsel_passes=6)
    kw.update(run_kw)
    label = f"{w}x{h} maps, wr{kw['window_rows']}"
    try:
        out = plan.run(jnp.zeros(grid.volume_shape, jnp.float32), **kw)
        checksum = float(out.sum())
        best = 1e9
        for _ in range(reps):
            t0 = time.perf_counter()
            checksum = float(
                plan.run(jnp.zeros(grid.volume_shape, jnp.float32),
                         **kw).sum()
            )
            best = min(best, time.perf_counter() - t0)
        ups = grid.num_cells * n_views / best
        print(f"  {label}: {ups / 1e9:6.2f} G upd/s ({best * 1000:7.1f} ms)"
              f" checksum {checksum:.6g}", flush=True)
    except Exception as e:
        print(f"  {label}: FAILED [{type(e).__name__}] {str(e)[:160]}",
              flush=True)


def probe_downgrade_parity(w=1024, h=768, n_views=4):
    """mode='rowsel3' auto-downgrades to 'rowsel' above the 3-plane
    ceiling; verify it runs AND matches the XLA integrator's checksum."""
    from cudadepthmapintegration_tpu.ops import integrate as I

    grid, views, params = workload(w, h, n_views=n_views)
    plan = OrientedFusionPlan(grid, views, params, subtile_rows=64)
    out = plan.run(jnp.zeros(grid.volume_shape, jnp.float32),
                   mode="rowsel3", window_rows=64, rowsel_passes=6)
    s_pallas = float(out.sum())
    t = I.projection_tables(grid, views, np.float32)
    depths = np.stack([v.depth for v in views]).astype(np.float32)
    vol = I._integrate_batched(
        jnp.zeros(grid.volume_shape, jnp.float32),
        *[jnp.asarray(a) for a in (t.tx, t.ty, t.tz, t.tc, depths)],
        h=h, w=w, view_batch=4, thick=params.thick, rho=params.rho,
        eta=params.eta, delta=params.delta,
    )
    s_xla = float(vol.sum())
    rel = abs(s_pallas - s_xla) / max(abs(s_xla), 1.0)
    tag = "OK" if rel < 1e-3 else "MISMATCH"
    print(f"  downgrade parity @{w}x{h}: pallas {s_pallas:.6g} vs "
          f"xla {s_xla:.6g} (rel {rel:.2e}) {tag}", flush=True)


def main():
    print("== VGA-class sizes + wr tuning (256^3 x 8 views) ==", flush=True)
    probe(640, 480, window_rows=64)
    probe(640, 480, window_rows=32)
    probe(512, 512, window_rows=64)  # bench-geometry anchor at this view count
    print("== ceiling probes ==", flush=True)
    probe(800, 600, window_rows=64)   # 5.8 MB/plane-block x2 = 11.5 MB
    probe(1024, 768, window_rows=64)  # auto-downgrades to rowsel (1 plane)
    probe(1280, 960, window_rows=64)  # single-plane 9.8 MB: should run
    probe(1600, 1200, window_rows=64)  # 15.7 MB single-plane: expect raise
    print("== downgrade parity ==", flush=True)
    probe_downgrade_parity()
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
