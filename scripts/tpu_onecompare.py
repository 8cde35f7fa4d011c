"""One-band HBM sweep vs whole-map VMEM staging at the BENCH configs.

cap2 (docs/KERNEL.md round-4) measured the one-band band-sweep ABOVE the
whole-map VMEM mode at 640x480 (rowsel3h 1.48 G vs rowsel3 1.34) — same
residency, same math, so the delta is kernel plumbing (the band kernel's
per-(subtile, view) ``pl.when(any(in_band))`` early-out and its leaner
block specs). If that ordering holds at the bench's primary configs
(512^2 maps: one 512-row band fits the 8 MiB double-buffer budget), the
production default mode should become the band sweep. Checksums must
bit-match (the proven any-band-height identity).
"""

import sys
import time

sys.path.insert(0, ".")

import jax.numpy as jnp

from cudadepthmapintegration_tpu.core import RayPotential, VoxelGrid
from cudadepthmapintegration_tpu.kernels.integrate_pallas import (
    OrientedFusionPlan,
)
from cudadepthmapintegration_tpu.testing import (
    orbit_cameras,
    render_sphere_view,
)

PARAMS = RayPotential(thick=0.025, rho=0.8, eta=0.03, delta=0.1)


def main():
    import jax

    print(f"devices: {jax.devices()}", flush=True)
    for dims, n_views, reps, ks in ((257, 32, 5, (10,)), (513, 32, 5, (6,)),
                                    (1025, 16, 3, (6,))):
        grid = VoxelGrid(dims=(dims,) * 3, origin=(-1.6,) * 3,
                         spacing=(3.2 / (dims - 1),) * 3)
        cams = orbit_cameras(n_views, 4.0, focal=300.0, width=512,
                             image_height=512)
        views = [render_sphere_view(c, 512, 512, radius=1.0, background=-1.0)
                 for c in cams]
        plan = OrientedFusionPlan(grid, views, PARAMS, subtile_rows=64)
        n_upd = grid.num_cells * n_views
        ref = None
        for k in ks:
            for mode in ("rowsel3", "rowsel3h", "rowselh"):
                kw = dict(mode=mode, window_rows=64, rowsel_passes=k)
                t_all = time.time()
                try:
                    checksum = float(plan.run(
                        jnp.zeros(grid.volume_shape, jnp.float32),
                        **kw).sum())
                    best = 1e9
                    for _ in range(reps):
                        t1 = time.perf_counter()
                        checksum = float(plan.run(
                            jnp.zeros(grid.volume_shape, jnp.float32),
                            **kw).sum())
                        best = min(best, time.perf_counter() - t1)
                    tag = "" if ref is None or checksum == ref \
                        else "  MISMATCH"
                    ref = checksum if ref is None else ref
                    print(f"  {dims - 1}^3x{n_views} {mode:8s} k{k:2d}: "
                          f"{n_upd / best / 1e9:5.2f} G "
                          f"({best * 1e3:6.1f} ms) checksum "
                          f"{checksum:.6g}{tag} "
                          f"[incl compile {time.time() - t_all:.0f}s]",
                          flush=True)
                except Exception as e:
                    print(f"  {dims - 1}^3x{n_views} {mode:8s} k{k:2d}: "
                          f"FAILED [{type(e).__name__}] {str(e)[:140]}",
                          flush=True)
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
