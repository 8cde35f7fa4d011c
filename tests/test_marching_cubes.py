"""Marching-cubes validation.

The 256-row triangle table is pinned by topology property tests: for a sampled
signed-distance sphere the extracted surface must be watertight (every
interior edge shared by exactly two triangles) with Euler characteristic 2 —
any table typo breaks one of these. Geometry is pinned by comparing vertex
radii against the analytic sphere.
"""

import numpy as np
import pytest

from cudadepthmapintegration_tpu.core import VoxelGrid
from cudadepthmapintegration_tpu.ops.cell_to_point import cell_to_point
from cudadepthmapintegration_tpu.ops.marching_cubes import (
    extract_isosurface,
    marching_cubes,
)
from cudadepthmapintegration_tpu.ops.mc_tables import (
    EDGE_CORNERS,
    EDGE_TABLE,
    TRI_TABLE,
)


def sphere_points(n=33, r=1.0, extent=1.6):
    xs = np.linspace(-extent, extent, n)
    x, y, z = np.meshgrid(xs, xs, xs, indexing="ij")
    vals = np.sqrt(x * x + y * y + z * z) - r  # SDF, zero crossing at radius r
    return vals.transpose(2, 1, 0), xs  # (nz, ny, nx)


def test_tri_table_shape_and_structure():
    assert TRI_TABLE.shape == (256, 16)
    assert (TRI_TABLE[:, 15] == -1).all()  # 5 triangles max
    assert TRI_TABLE[0].max() == -1 and TRI_TABLE[255].max() == -1
    # Valid entries are edge ids, grouped in complete triangles.
    for row in TRI_TABLE:
        n = int((row >= 0).sum())
        assert n % 3 == 0
        assert (row[:n] >= 0).all() and (row[:n] <= 11).all()
        assert (row[n:] == -1).all()


def test_edge_table_complement_symmetry():
    # Inverting inside/outside uses the same cut edges.
    for c in range(256):
        assert EDGE_TABLE[c] == EDGE_TABLE[255 - c]


def test_single_corner_config():
    # Config 1 (only v0 below iso) must cut exactly edges 0, 3, 8.
    assert EDGE_TABLE[1] == (1 << 0) | (1 << 3) | (1 << 8)
    assert sorted(TRI_TABLE[1][:3].tolist()) == [0, 3, 8]


def _edge_use_counts(triangles):
    from collections import Counter

    counts = Counter()
    for a, b, c in triangles:
        for u, v in ((a, b), (b, c), (c, a)):
            counts[(min(u, v), max(u, v))] += 1
    return counts


@pytest.mark.parametrize("iso", [0.0, 0.17])
def test_sphere_surface_watertight(iso):
    vals, xs = sphere_points(n=21)
    mesh = marching_cubes(vals, iso, xs, xs, xs)
    assert mesh.num_triangles > 100
    counts = _edge_use_counts(mesh.triangles)
    # Closed surface: every edge shared by exactly 2 triangles.
    assert set(counts.values()) == {2}
    # Euler characteristic V - E + F == 2 for a sphere.
    v = mesh.num_points
    e = len(counts)
    f = mesh.num_triangles
    assert v - e + f == 2


def test_sphere_vertex_accuracy():
    vals, xs = sphere_points(n=41, r=1.0)
    mesh = marching_cubes(vals, 0.0, xs, xs, xs)
    radii = np.linalg.norm(mesh.points, axis=1)
    # Linear interpolation of an SDF: vertices lie on the sphere to O(h^2).
    assert np.abs(radii - 1.0).max() < 5e-3


def test_no_surface_returns_empty():
    vals, xs = sphere_points(n=9)
    mesh = marching_cubes(vals, 10.0, xs, xs, xs)  # iso outside value range
    assert mesh.num_points == 0
    assert mesh.num_triangles == 0


def test_cell_to_point_averaging():
    # 2x2x2 cells; interior point averages all 8 cells, corners copy 1 cell.
    cells = np.arange(8, dtype=np.float64).reshape(2, 2, 2)
    pts = np.asarray(cell_to_point(cells))
    assert pts.shape == (3, 3, 3)
    assert pts[0, 0, 0] == cells[0, 0, 0]
    assert pts[2, 2, 2] == cells[1, 1, 1]
    assert pts[1, 1, 1] == cells.mean()
    # Face-center point averages the 2 adjacent cells.
    assert pts[1, 0, 0] == (cells[0, 0, 0] + cells[1, 0, 0]) / 2


def test_matrix_applied_to_vertices():
    vals, xs = sphere_points(n=17)
    m = np.eye(4)
    m[:3, 3] = [10.0, -5.0, 2.0]
    a = marching_cubes(vals, 0.0, xs, xs, xs)
    b = marching_cubes(vals, 0.0, xs, xs, xs, matrix=m)
    np.testing.assert_allclose(b.points, a.points + [10.0, -5.0, 2.0], atol=1e-12)


def test_extract_isosurface_from_cell_volume():
    # Cell-scalar sphere through the full pipeline (cell->point + contour).
    grid = VoxelGrid(
        dims=(33, 33, 33), origin=(-1.6, -1.6, -1.6), spacing=(0.1, 0.1, 0.1)
    )
    centers = grid.cell_centers_world()
    vals = 1.0 - np.linalg.norm(centers, axis=-1)  # positive inside r=1
    mesh = extract_isosurface(grid, vals, iso=0.0)
    radii = np.linalg.norm(mesh.points, axis=1)
    assert mesh.num_triangles > 100
    assert np.abs(radii - 1.0).max() < 0.05


def test_edge_corners_consistent_with_offsets():
    # Each edge must connect corners differing in exactly one axis by 1.
    from cudadepthmapintegration_tpu.ops.mc_tables import CORNER_OFFSETS

    for a, b in EDGE_CORNERS:
        d = np.abs(CORNER_OFFSETS[b] - CORNER_OFFSETS[a])
        assert d.sum() == 1


def test_device_weld_bit_identical():
    """weld_backend='device' (round 5: sort/unique/compaction on device,
    only the final mesh crosses to host) must match the host weld bit for
    bit — points, triangles, normals, with and without a grid matrix."""
    import numpy as np

    from cudadepthmapintegration_tpu.ops.marching_cubes import marching_cubes

    dim = 24
    ax = np.linspace(-1.2, 1.2, dim, dtype=np.float32)
    zz, yy, xx = np.meshgrid(ax, ax, ax, indexing="ij")
    vol = 1.0 - np.sqrt(xx * xx + yy * yy + zz * zz)
    mat = np.eye(4)
    mat[:3, :3] = [[0, -1, 0], [1, 0, 0], [0, 0, 1]]
    mat[:3, 3] = [0.1, -0.2, 0.3]
    for matrix in (None, mat):
        a = marching_cubes(vol, 0.0, ax, ax, ax, matrix=matrix,
                           backend="jax", compute_normals=True,
                           weld_backend="host")
        b = marching_cubes(vol, 0.0, ax, ax, ax, matrix=matrix,
                           backend="jax", compute_normals=True,
                           weld_backend="device")
        np.testing.assert_array_equal(b.points, a.points)
        np.testing.assert_array_equal(b.triangles, a.triangles)
        np.testing.assert_array_equal(
            b.point_data["Normals"], a.point_data["Normals"])
        assert b.points.dtype == a.points.dtype


def test_chunked_cell_emission_bit_identical():
    """Active cells are emitted in CELL_CHUNK-sized calls (a single call's
    un-fused temps OOM'd the 16 G chip at a 2M-cell pad); forcing many tiny
    chunks must reproduce the single-call mesh bit for bit."""
    import numpy as np

    import importlib

    M = importlib.import_module("cudadepthmapintegration_tpu.ops.marching_cubes")

    dim = 28
    ax = np.linspace(-1.2, 1.2, dim, dtype=np.float32)
    zz, yy, xx = np.meshgrid(ax, ax, ax, indexing="ij")
    vol = 1.0 - np.sqrt(xx * xx + yy * yy + zz * zz)
    a = M.marching_cubes(vol, 0.0, ax, ax, ax, backend="jax")
    old = M.CELL_CHUNK
    M.CELL_CHUNK = 512  # force the multi-chunk path
    try:
        b = M.marching_cubes(vol, 0.0, ax, ax, ax, backend="jax")
    finally:
        M.CELL_CHUNK = old
    np.testing.assert_array_equal(b.points, a.points)
    np.testing.assert_array_equal(b.triangles, a.triangles)
