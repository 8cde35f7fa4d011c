"""Hardware validation: run the REAL Mosaic-compiled kernel on the attached
TPU and check parity against the float64 NumPy oracle across varied geometry.

(The pytest suite runs the same kernel code through the Pallas interpreter on
CPU; this script validates the actual hardware lowering. Run manually:
    python scripts/tpu_validate.py
)
"""

import sys
import time

import numpy as np

sys.path.insert(0, ".")

import jax.numpy as jnp

from cudadepthmapintegration_tpu.core import RayPotential, VoxelGrid

from cudadepthmapintegration_tpu.core.grid import grid_matrix_from_axes
from cudadepthmapintegration_tpu.kernels.integrate_pallas import (
    integrate_views_oriented,
)
from cudadepthmapintegration_tpu.ops import integrate_views_oracle
from cudadepthmapintegration_tpu.testing import sphere_scene, orbit_cameras


def check(name, grid, views, params, flip_budget=2e-4):
    t0 = time.time()
    got = np.asarray(
        integrate_views_oriented(
            np.zeros(grid.volume_shape, np.float32), grid, views, params
        )
    )
    dt = time.time() - t0
    exp = integrate_views_oracle(grid, views, params).astype(np.float32)
    err = np.abs(got - exp)
    flips = (err > 1e-3).mean()
    ok = flips <= flip_budget
    print(
        f"{'PASS' if ok else 'FAIL'} {name}: median_err={np.median(err):.2e} "
        f"pixel-flip-frac={flips:.2e} (budget {flip_budget:.0e}) [{dt:.1f}s]",
        flush=True,
    )
    return ok


def main():
    params = RayPotential(thick=0.05, rho=0.8, eta=0.03, delta=0.2)
    ok = True

    # 1. 64^3, 8 orbit views (asymmetric origin avoids .5-boundary noise).
    grid = VoxelGrid(
        dims=(65, 65, 65), origin=(-1.63, -1.61, -1.59), spacing=(0.05,) * 3
    )
    views = sphere_scene(n_views=8, width=256, height=192, focal=150.0)
    ok &= check("64^3 x 8 orbit views", grid, views, params)

    # 2. Rotated grid matrix (reference CreateGridMatrixFromInput semantics).
    m = grid_matrix_from_axes((0, 1, 0), (-1, 0, 0), (0, 0, 1))
    grid_r = VoxelGrid(
        dims=(65, 65, 65), origin=(-1.63, -1.61, -1.59),
        spacing=(0.05,) * 3, matrix=m,
    )
    ok &= check("64^3 rotated grid matrix", grid_r, views, params)

    # 3. Elevated + rolled cameras (stresses orientation grouping/fallbacks).
    cams = orbit_cameras(6, 3.5, height=2.0, focal=180.0,
                         width=256, image_height=192)
    from cudadepthmapintegration_tpu.testing import render_sphere_view

    views_e = [render_sphere_view(c, 256, 192) for c in cams]
    ok &= check("64^3 elevated cameras", grid, views_e, params)

    # 4. Non-uniform spacing + anisotropic dims.
    grid_a = VoxelGrid(
        dims=(129, 49, 97), origin=(-1.6, -0.9, -1.2),
        spacing=(0.025, 0.0375, 0.025),
    )
    ok &= check("anisotropic grid", grid_a, views, params)

    # 5. Best-cost thresholding path on hardware.
    t0 = time.time()
    got = np.asarray(
        integrate_views_oriented(
            np.zeros(grid.volume_shape, np.float32), grid, views, params,
            threshold_best_cost=0.5,
        )
    )
    exp = integrate_views_oracle(
        grid, views, params, threshold_best_cost=0.5
    ).astype(np.float32)
    flips = (np.abs(got - exp) > 1e-3).mean()
    print(
        f"{'PASS' if flips < 2e-4 else 'FAIL'} best-cost threshold: "
        f"flip-frac={flips:.2e} [{time.time()-t0:.1f}s]",
        flush=True,
    )
    ok &= flips < 2e-4

    print("ALL PASS" if ok else "FAILURES PRESENT", flush=True)
    return 0 if ok else 1


if __name__ == "__main__":
    raise SystemExit(main())
