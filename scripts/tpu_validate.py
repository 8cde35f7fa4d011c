"""Hardware validation: run the REAL Mosaic-compiled kernel on the attached
TPU and check parity against the float64 NumPy oracle across varied geometry.

(The pytest suite runs the same kernel code through the Pallas interpreter on
CPU; this script validates the actual hardware lowering. Run manually:
    python scripts/tpu_validate.py
It is also invoked by bench.py every round — the parity gate that pins the
Mosaic lowering automatically, not just on manual runs.)
"""

import sys
import time

import numpy as np

sys.path.insert(0, ".")

from cudadepthmapintegration_tpu.core import RayPotential, VoxelGrid
from cudadepthmapintegration_tpu.core.grid import grid_matrix_from_axes
from cudadepthmapintegration_tpu.kernels.integrate_pallas import (
    integrate_views_oriented,
)
from cudadepthmapintegration_tpu.ops import integrate_views_oracle
from cudadepthmapintegration_tpu.testing import (
    orbit_cameras,
    render_sphere_view,
    sphere_scene,
)

FLIP_BUDGET = 2e-4


def parity_cases():
    """The hardware-parity geometry cases: (name, grid, views, params,
    threshold_best_cost)."""
    params = RayPotential(thick=0.05, rho=0.8, eta=0.03, delta=0.2)
    views = sphere_scene(n_views=8, width=256, height=192, focal=150.0)

    grid = VoxelGrid(
        dims=(65, 65, 65), origin=(-1.63, -1.61, -1.59), spacing=(0.05,) * 3
    )
    m = grid_matrix_from_axes((0, 1, 0), (-1, 0, 0), (0, 0, 1))
    grid_r = VoxelGrid(
        dims=(65, 65, 65), origin=(-1.63, -1.61, -1.59),
        spacing=(0.05,) * 3, matrix=m,
    )
    cams = orbit_cameras(6, 3.5, height=2.0, focal=180.0,
                         width=256, image_height=192)
    views_e = [render_sphere_view(c, 256, 192) for c in cams]
    grid_a = VoxelGrid(
        dims=(129, 49, 97), origin=(-1.6, -0.9, -1.2),
        spacing=(0.025, 0.0375, 0.025),
    )
    # Odd image dims: 600x456 is a multiple of neither 128 (lanes) nor 8
    # (sublanes), so the kernel's depth-padding path (-1 sentinel fill +
    # real-h/w bounds tests) is exercised, unlike the 256x192 cases.
    views_o = sphere_scene(n_views=4, width=600, height=456, focal=350.0)
    return [
        ("64^3 x 8 orbit views", grid, views, params, None),
        ("64^3 rotated grid matrix", grid_r, views, params, None),
        ("64^3 elevated cameras", grid, views_e, params, None),
        ("anisotropic grid", grid_a, views, params, None),
        ("best-cost threshold", grid, views, params, 0.5),
        ("odd image dims 600x456", grid, views_o, params, None),
    ]


def run_parity(verbose: bool = True, **kernel_kw):
    """Run all parity cases on the attached device; returns (ok, max_flip).

    ``kernel_kw`` forwards to integrate_views_oriented (mode/tunables)."""
    ok = True
    max_flip = 0.0
    for name, grid, views, params, thr in parity_cases():
        t0 = time.time()
        got = np.asarray(
            integrate_views_oriented(
                np.zeros(grid.volume_shape, np.float32), grid, views, params,
                threshold_best_cost=thr, **kernel_kw,
            )
        )
        dt = time.time() - t0
        exp = integrate_views_oracle(
            grid, views, params, threshold_best_cost=thr
        ).astype(np.float32)
        err = np.abs(got - exp)
        flips = float((err > 1e-3).mean())
        max_flip = max(max_flip, flips)
        case_ok = flips <= FLIP_BUDGET
        ok &= case_ok
        if verbose:
            print(
                f"{'PASS' if case_ok else 'FAIL'} {name}: "
                f"median_err={np.median(err):.2e} "
                f"pixel-flip-frac={flips:.2e} (budget {FLIP_BUDGET:.0e}) "
                f"[{dt:.1f}s]",
                flush=True,
            )
    return ok, max_flip


def main():
    ok, _ = run_parity(verbose=True)
    print("ALL PASS" if ok else "FAILURES PRESENT", flush=True)
    return 0 if ok else 1


if __name__ == "__main__":
    raise SystemExit(main())
