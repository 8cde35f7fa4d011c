"""Integration parity: XLA integrator vs the float64 NumPy oracle, plus
projection/index-convention property tests."""

import numpy as np
import pytest

from cudadepthmapintegration_tpu.core import (
    DepthMapView,
    RayPotential,
    VoxelGrid,
    grid_matrix_from_axes,
    round_half_away,
)
from cudadepthmapintegration_tpu.ops import TSDFIntegrator, integrate_views_oracle
from cudadepthmapintegration_tpu.testing import sphere_scene

PARAMS = RayPotential(thick=0.06, rho=0.8, eta=0.03, delta=0.2)


def small_grid(dims=(17, 17, 17), matrix=None):
    return VoxelGrid(
        dims=dims,
        origin=(-1.6, -1.6, -1.6),
        spacing=(0.2, 0.2, 0.2),
        matrix=np.eye(4) if matrix is None else matrix,
    )


def test_round_half_away_matches_c():
    xs = np.array([0.5, 1.5, -0.5, -1.5, 2.49, -2.49, 0.0])
    np.testing.assert_array_equal(round_half_away(xs), [1, 2, -1, -2, 2, -2, 0])


def test_oracle_matches_xla_float64():
    views = sphere_scene(n_views=4, width=64, height=48)
    grid = small_grid()
    expected = integrate_views_oracle(grid, views, PARAMS)
    got = (
        TSDFIntegrator(grid, PARAMS, dtype=np.float64, view_batch=3)
        .reset()
        .integrate(views)
        .result()
    )
    np.testing.assert_allclose(got, expected, atol=1e-9)
    # Sanity: the fused volume actually saw the sphere.
    assert expected.max() > 0.5
    assert expected.min() < 0.0


def test_oracle_matches_xla_float32_within_epsilon():
    views = sphere_scene(n_views=6, width=64, height=48)
    grid = small_grid()
    expected = integrate_views_oracle(grid, views, PARAMS)
    got = (
        TSDFIntegrator(grid, PARAMS, dtype=np.float32, view_batch=4)
        .reset()
        .integrate(views)
        .result()
    )
    # fp32 projection can flip a pixel on rounding boundaries; bound the
    # fraction of differing voxels and the error elsewhere.
    diff = np.abs(got - expected)
    assert np.mean(diff > 1e-3) < 2e-3
    assert np.median(diff) < 1e-5


def test_grid_matrix_rotation():
    # Rotated grid axes must behave identically to pre-rotating the geometry.
    views = sphere_scene(n_views=3, width=48, height=36)
    m = grid_matrix_from_axes((0, 1, 0), (-1, 0, 0), (0, 0, 1))
    grid = small_grid(matrix=m)
    expected = integrate_views_oracle(grid, views, PARAMS)
    got = (
        TSDFIntegrator(grid, PARAMS, dtype=np.float64)
        .reset()
        .integrate(views)
        .result()
    )
    np.testing.assert_allclose(got, expected, atol=1e-9)


def test_best_cost_threshold_applied():
    views = sphere_scene(n_views=2, width=48, height=36)
    # Mark half of each image as high-cost; those pixels must not contribute.
    for v in views:
        v.best_cost = np.where(
            np.arange(v.width)[None, :] < v.width // 2, 1.0, 0.0
        ).repeat(1, axis=0) * np.ones((v.height, 1))
    grid = small_grid()
    expected = integrate_views_oracle(grid, views, PARAMS, threshold_best_cost=0.5)
    got = (
        TSDFIntegrator(grid, PARAMS, dtype=np.float64)
        .reset()
        .integrate(views, threshold_best_cost=0.5)
        .result()
    )
    np.testing.assert_allclose(got, expected, atol=1e-9)
    # And thresholding must actually change the result.
    unthresholded = integrate_views_oracle(grid, views, PARAMS)
    assert not np.allclose(unthresholded, expected)


def test_incremental_matches_single_shot():
    # Fusion is a sum over views: feeding views in two batches must equal one
    # batch (the reference's d_outScalar accumulates across launches,
    # CudaReconstruction.cu:326-363).
    views = sphere_scene(n_views=5, width=48, height=36)
    grid = small_grid()
    single = (
        TSDFIntegrator(grid, PARAMS, dtype=np.float64).reset().integrate(views).result()
    )
    inc = TSDFIntegrator(grid, PARAMS, dtype=np.float64).reset()
    inc.integrate(views[:2]).integrate(views[2:])
    np.testing.assert_allclose(inc.result(), single, atol=1e-12)
    assert inc.views_fused == 5


def test_resume_from_initial_volume():
    # "Resume by re-feeding a prior grid" (CudaReconstruction.cu:324-327 seeds
    # d_outScalar from the input scalars).
    views = sphere_scene(n_views=4, width=48, height=36)
    grid = small_grid()
    first = (
        TSDFIntegrator(grid, PARAMS, dtype=np.float64)
        .reset()
        .integrate(views[:2])
        .result()
    )
    resumed = TSDFIntegrator(grid, PARAMS, dtype=np.float64)
    resumed.reset(initial=first)
    resumed.integrate(views[2:])
    full = (
        TSDFIntegrator(grid, PARAMS, dtype=np.float64).reset().integrate(views).result()
    )
    np.testing.assert_allclose(resumed.result(), full, atol=1e-12)


def test_behind_camera_rejected():
    # A view looking AWAY from the grid must contribute nothing (hom.z < 0
    # rejection, CudaReconstruction.cu:177-180).
    from cudadepthmapintegration_tpu.testing import look_at_camera

    cam = look_at_camera((0, -4, 0), (0, -8, 0), width=32, height=24)
    depth = np.full((24, 32), 5.0)
    view = DepthMapView(depth=depth, camera=cam)
    grid = small_grid()
    out = (
        TSDFIntegrator(grid, PARAMS, dtype=np.float64)
        .reset()
        .integrate([view])
        .result()
    )
    np.testing.assert_array_equal(out, 0.0)


def test_mismatched_depth_dims_rejected():
    views = sphere_scene(n_views=2, width=48, height=36)
    views[1] = DepthMapView(depth=np.zeros((20, 20)), camera=views[1].camera)
    grid = small_grid()
    with pytest.raises(ValueError, match="expected"):
        TSDFIntegrator(grid, PARAMS).reset().integrate(views)
