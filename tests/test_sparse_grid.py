"""Sparse block-hashed TSDF fusion vs the dense oracle."""

import numpy as np
import pytest

from cudadepthmapintegration_tpu.core import RayPotential
from cudadepthmapintegration_tpu.ops import integrate_views_oracle
from cudadepthmapintegration_tpu.ops.sparse_grid import SparseTSDFGrid
from cudadepthmapintegration_tpu.testing import sphere_scene

PARAMS = RayPotential(thick=0.06, rho=0.8, eta=0.03, delta=0.2)


def test_sparse_matches_dense_on_allocated_blocks():
    views = sphere_scene(n_views=4, width=96, height=72, focal=80.0)
    sparse = SparseTSDFGrid(voxel_size=0.1, params=PARAMS, pixel_stride=2)
    for v in views:
        sparse.integrate_frame(v)
    assert sparse.num_allocated > 10
    assert sparse.frames_fused == 4

    dense, grid = sparse.to_dense()
    # Dense oracle over the SAME grid region.
    expected = integrate_views_oracle(grid, views, PARAMS)

    # Allocated cells must match the dense fusion exactly (same math).
    pool_mask = np.zeros(dense.shape, bool)
    bz, by, bx = sparse.block_shape
    lo, _ = sparse.allocated_bounds()
    for (cx_, cy_, cz_) in sparse.block_map:
        iz, iy, ix = (cz_ - lo[2]) * bz, (cy_ - lo[1]) * by, (cx_ - lo[0]) * bx
        pool_mask[iz : iz + bz, iy : iy + by, ix : ix + bx] = True
    err = np.abs(dense[pool_mask] - expected.astype(np.float32)[pool_mask])
    assert (err > 1e-3).mean() < 1e-6

    # Every SURFACE cell (|value| beyond the carve floor) is allocated:
    # the band walk must not miss the crossing region.
    strong = np.abs(expected) > PARAMS.rho * 0.5
    assert (strong & ~pool_mask).sum() == 0


def test_sparse_mesh_approximates_sphere():
    views = sphere_scene(n_views=8, width=96, height=72, focal=80.0)
    sparse = SparseTSDFGrid(voxel_size=0.08, params=PARAMS, pixel_stride=2)
    for v in views:
        sparse.integrate_frame(v)
    mesh = sparse.extract_mesh(iso=1.0)
    assert mesh.num_triangles > 100
    radii = np.linalg.norm(mesh.points, axis=1)
    assert abs(np.median(radii) - 1.0) < 0.08


def test_capacity_exhaustion_raises():
    views = sphere_scene(n_views=1, width=64, height=48)
    sparse = SparseTSDFGrid(voxel_size=0.05, params=PARAMS, capacity=4)
    with pytest.raises(RuntimeError, match="capacity"):
        sparse.integrate_frame(views[0])


def test_empty_frame_is_noop():
    views = sphere_scene(n_views=1, width=64, height=48)
    view = views[0]
    view.depth[:] = -1.0
    sparse = SparseTSDFGrid(voxel_size=0.1, params=PARAMS)
    sparse.integrate_frame(view)
    assert sparse.num_allocated == 0
    assert sparse.frames_fused == 0
