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


def main():
    import jax

    print(f"devices: {jax.devices()}", flush=True)
    grid = VoxelGrid(dims=(257,) * 3, origin=(-1.6,) * 3,
                     spacing=(3.2 / 256,) * 3)
    for w, h in ((640, 480), (1024, 768), (1920, 1080)):
        cams = orbit_cameras(8, 4.0, focal=0.6 * w, width=w, image_height=h)
        views = [render_sphere_view(c, w, h, radius=1.0, background=-1.0)
                 for c in cams]
        ref = None
        for cap in (64, 128, 256):
            KP.HBM_BAND_CAP = cap
            try:
                plan = OrientedFusionPlan(grid, views, PARAMS,
                                          subtile_rows=64)
                kw = dict(mode="rowsel3h", window_rows=64, rowsel_passes=6)
                checksum = float(plan.run(
                    jnp.zeros(grid.volume_shape, jnp.float32), **kw).sum())
                best = 1e9
                for _ in range(3):
                    t0 = time.perf_counter()
                    checksum = float(plan.run(
                        jnp.zeros(grid.volume_shape, jnp.float32),
                        **kw).sum())
                    best = min(best, time.perf_counter() - t0)
                ups = grid.num_cells * 8 / best
                tag = "" if ref is None or checksum == ref else "  MISMATCH"
                ref = checksum if ref is None else ref
                print(f"  {w}x{h} cap{cap:3d}: {ups / 1e9:5.2f} G "
                      f"({best * 1e3:6.1f} ms) checksum {checksum:.6g}{tag}",
                      flush=True)
            except Exception as e:
                print(f"  {w}x{h} cap{cap:3d}: FAILED [{type(e).__name__}] "
                      f"{str(e)[:140]}", flush=True)
        KP.HBM_BAND_CAP = 64
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
