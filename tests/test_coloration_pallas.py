"""Pallas coloration kernel (interpret mode) vs the XLA gather path."""

import numpy as np

import cudadepthmapintegration_tpu.kernels.integrate_pallas as KP
from cudadepthmapintegration_tpu.kernels.coloration_pallas import (
    gather_colors_pallas,
)
from cudadepthmapintegration_tpu.ops.coloration import colorize_points
from cudadepthmapintegration_tpu.testing import sphere_scene

KP.INTERPRET = True


def _scene(n_views=3):
    views = sphere_scene(n_views=n_views, width=144, height=64, focal=60.0)
    rng = np.random.default_rng(7)
    for v in views:
        v.color[:] = rng.integers(0, 256, v.color.shape, dtype=np.uint8)
    return views


def test_gather_matches_xla_gather():
    views = _scene()
    rng = np.random.default_rng(1)
    pts = (rng.random((500, 3)) - 0.5) * 7.0
    # Sort by (z, y, x) to mimic mesh raster order (footprint coherence).
    pts = pts[np.lexsort(pts.T)]
    proj = np.stack([(v.camera.k4 @ v.camera.rt)[:3, :] for v in views])
    colors = np.stack([v.color for v in views])
    samples, valid = gather_colors_pallas(
        pts.astype(np.float32), proj, colors
    )
    assert valid.any() and (~valid).any()

    a = colorize_points(pts, views, backend="pallas")
    b = colorize_points(pts, views, backend="xla", dtype=np.float32)
    for x, y in zip(a, b):
        np.testing.assert_array_equal(x, y)


def test_z_test_mode_matches():
    views = _scene(2)
    rng = np.random.default_rng(2)
    pts = (rng.random((130, 3)) - 0.5) * 2.0
    a = colorize_points(pts, views, backend="pallas", z_test=True)
    b = colorize_points(pts, views, backend="xla", z_test=True,
                        dtype=np.float32)
    for x, y in zip(a, b):
        np.testing.assert_array_equal(x, y)
