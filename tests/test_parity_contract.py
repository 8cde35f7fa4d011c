"""The parity contract (SURVEY.md section 7.1), one test per clause.

Each test pins one semantic the reference defines, against the float64
oracle or closed-form values. Deeper coverage of each area lives in the
dedicated test files; this file is the contract index.
"""

import numpy as np

from cudadepthmapintegration_tpu.core import (
    Camera,
    DepthMapView,
    RayPotential,
    VoxelGrid,
    grid_matrix_from_axes,
    round_half_away,
)
from cudadepthmapintegration_tpu.io import read_krtd, write_krtd
from cudadepthmapintegration_tpu.ops import (
    TSDFIntegrator,
    cell_to_point,
    integrate_views_oracle,
)
from cudadepthmapintegration_tpu.testing import look_at_camera, sphere_scene

P = RayPotential(thick=0.1, rho=0.8, eta=0.03, delta=0.3)


def test_c1_grid_cell_model():
    """dims are POINT dims; scalars live on cells = dims-1 per axis; linear
    id (k*cy + j)*cx + i (vtkCudaReconstructionFilter.cxx:132,
    CudaReconstruction.cu:126-134)."""
    g = VoxelGrid(dims=(5, 6, 7), origin=(0, 0, 0), spacing=(1, 1, 1))
    assert g.cell_dims == (4, 5, 6)
    assert g.num_cells == 4 * 5 * 6
    # C-order ravel of (cz, cy, cx) reproduces the reference id.
    vol = np.arange(g.num_cells).reshape(g.volume_shape)
    i, j, k = 2, 3, 4
    assert vol[k, j, i] == (k * 5 + j) * 4 + i


def test_c2_voxel_center_and_grid_matrix():
    """center = orig + (idx+0.5)*spacing, then the 4x4 grid matrix with the
    CLI's row-wise basis layout (CudaReconstruction.cu:78-83,
    main.cxx:345-359)."""
    m = grid_matrix_from_axes((0, 1, 0), (-1, 0, 0), (0, 0, 1))
    assert m[0, 1] == 1 and m[1, 0] == -1  # VecX in ROW 0, VecY in ROW 1
    g = VoxelGrid(dims=(3, 3, 3), origin=(1, 2, 3), spacing=(0.5, 1, 2), matrix=m)
    centers = g.cell_centers_world()
    # cell (0,0,0): grid-frame center (1.25, 2.5, 4); world = M @ center.
    np.testing.assert_allclose(
        centers[0, 0, 0], m[:3, :3] @ np.array([1.25, 2.5, 4.0])
    )


def test_c3_projection_round_and_rejections():
    """pixel = round_half_away(K4·RT·world / z); reject hom.z < 0; bounds
    test then -1 sentinel (CudaReconstruction.cu:166-205)."""
    np.testing.assert_array_equal(
        round_half_away(np.array([0.5, -0.5, 1.49, -1.5])), [1, -1, 1, -2]
    )
    # A camera looking AWAY: all voxels rejected by hom.z < 0.
    cam = look_at_camera((0, -4, 0), (0, -8, 0), width=32, height=24)
    grid = VoxelGrid(dims=(9, 9, 9), origin=(-1.6,) * 3, spacing=(0.4,) * 3)
    view = DepthMapView(depth=np.full((24, 32), 5.0), camera=cam)
    np.testing.assert_array_equal(
        integrate_views_oracle(grid, [view], P), 0.0
    )


def test_c4_depth_is_camera_z_and_sentinel():
    """real distance = camera-space z (not ray length); -1 = invalid
    (CudaReconstruction.cu:202-207)."""
    cam = look_at_camera((0, -4, 0), (0, 0, 0), width=33, height=25, focal=10)
    grid = VoxelGrid(dims=(2, 2, 2), origin=(-0.05, -0.05, -0.05),
                     spacing=(0.1, 0.1, 0.1))
    # Single voxel at origin: camera z distance is 4 (not sqrt(16+eps)).
    depth = np.full((25, 33), 4.0)
    view = DepthMapView(depth=depth, camera=cam)
    out = integrate_views_oracle(grid, [view], P)
    # diff = 4 - 4 = 0 -> ramp value 0 exactly (on-surface).
    np.testing.assert_allclose(out, 0.0, atol=1e-12)
    # Same view with -1 depth: no contribution either, but via the sentinel.
    view2 = DepthMapView(depth=np.full((25, 33), -1.0), camera=cam)
    np.testing.assert_array_equal(integrate_views_oracle(grid, [view2], P), 0.0)


def test_c5_ray_potential_piecewise_and_sum():
    """Exact piecewise profile; accumulation = sum over views
    (CudaReconstruction.cu:104-120,211). Golden values in
    test_ray_potential.py; here: summing two identical views doubles."""
    views = sphere_scene(n_views=2, width=48, height=36)
    grid = VoxelGrid(dims=(9, 9, 9), origin=(-1.6,) * 3, spacing=(0.4,) * 3)
    one = integrate_views_oracle(grid, [views[0]], P)
    two = integrate_views_oracle(grid, [views[0], views[0]], P)
    np.testing.assert_allclose(two, 2 * one, atol=1e-12)


def test_c6_isosurface_cell_to_point_then_contour():
    """Contour runs on point data averaged from cells
    (Reconstruction/main.cxx:150-173); grid matrix applied to vertices.
    Deep coverage: test_marching_cubes.py. Here: averaging semantics."""
    cells = np.zeros((2, 2, 2))
    cells[0, 0, 0] = 8.0
    pts = np.asarray(cell_to_point(cells))
    assert pts[0, 0, 0] == 8.0  # corner point: single incident cell
    assert pts[1, 1, 1] == 1.0  # interior point: mean of 8 cells


def test_c7_coloration_outputs_and_quirks():
    """Mean/median/count arrays; no z or occlusion test; truncating uchar
    stores; even-count median averaging (MeshColoration.cxx:98-199,
    Helper.h:174-187). Deep coverage: test_coloration.py."""
    from cudadepthmapintegration_tpu.ops import colorize_points

    views = sphere_scene(n_views=4, width=64, height=48)
    for v, val in zip(views, [10, 20, 40, 80]):
        v.color[:] = val
    mean, med, count = colorize_points(np.zeros((1, 3)), views, dtype=np.float64)
    assert count[0] == 4
    assert tuple(med[0]) == (30, 30, 30)  # (20+40)/2
    assert tuple(mean[0]) == (37, 37, 37)  # floor(150/4)


def test_c8_file_formats():
    """KRTD layout with ignored distortion (Helper.h:105-168); list files by
    last token relative to the list dir (Helper.h:60-100); VTI arrays named
    Depths / Best Cost Values / Color. Deep coverage: test_io.py,
    test_vtkxml_encodings.py. Here: KRTD structural layout."""
    import io as _io
    import tempfile, os

    cam = Camera(k=np.diag([100.0, 110.0, 1.0]), rt=np.eye(4))
    with tempfile.TemporaryDirectory() as d:
        path = os.path.join(d, "c.krtd")
        write_krtd(path, cam)
        lines = open(path).read().splitlines()
        assert lines[3] == ""  # blank between K and R
        assert lines[7] == ""  # blank between R and T
        back = read_krtd(path)
        np.testing.assert_array_equal(back.k, cam.k)


def test_resume_semantics():
    """The accumulated grid is a pure sum seeded from the input scalars
    (CudaReconstruction.cu:324-327): resume = re-feed a prior grid."""
    views = sphere_scene(n_views=4, width=48, height=36)
    grid = VoxelGrid(dims=(9, 9, 9), origin=(-1.6,) * 3, spacing=(0.4,) * 3)
    full = TSDFIntegrator(grid, P, dtype=np.float64).reset().integrate(views).result()
    part = TSDFIntegrator(grid, P, dtype=np.float64).reset().integrate(views[:2]).result()
    resumed = (
        TSDFIntegrator(grid, P, dtype=np.float64)
        .reset(part)
        .integrate(views[2:])
        .result()
    )
    np.testing.assert_allclose(resumed, full, atol=1e-12)
