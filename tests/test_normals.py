"""Gradient mesh normals (ops/normals.py).

The reference's contour stage is an unmodified vtkContourFilter
(``Reconstruction/main.cxx:169-173``) whose ComputeNormals default is ON:
output meshes carry a "Normals" point array = normalized -gradient of the
scalar field interpolated to the crossing. These tests pin direction
(analytic sphere), unit length, backend equality (jax vs native keys),
matrix transform semantics, and the end-to-end pipeline surface.
"""

import numpy as np
import pytest

from cudadepthmapintegration_tpu.core import VoxelGrid
from cudadepthmapintegration_tpu.ops.marching_cubes import (
    extract_isosurface,
    marching_cubes,
)
from cudadepthmapintegration_tpu.ops.normals import transform_normals


def sphere_points(n=33, r=1.0, extent=1.6):
    xs = np.linspace(-extent, extent, n)
    x, y, z = np.meshgrid(xs, xs, xs, indexing="ij")
    vals = np.sqrt(x * x + y * y + z * z) - r  # SDF: negative inside
    return vals.transpose(2, 1, 0), xs


def test_sphere_normals_point_inward_for_sdf():
    # SDF grows outward, so -gradient (VTK convention) points INWARD.
    pv, xs = sphere_points()
    mesh = marching_cubes(pv, 0.0, xs, xs, xs, compute_normals=True)
    n = mesh.point_data["Normals"]
    assert n.shape == (mesh.num_points, 3) and n.dtype == np.float32
    radial = mesh.points / np.linalg.norm(mesh.points, axis=1, keepdims=True)
    dots = (n * radial).sum(axis=1)
    assert (dots < -0.98).all()  # tight: sphere gradient is exactly radial


def test_normals_unit_length():
    pv, xs = sphere_points(21)
    mesh = marching_cubes(pv, 0.0, xs, xs, xs, compute_normals=True)
    norms = np.linalg.norm(mesh.point_data["Normals"], axis=1)
    np.testing.assert_allclose(norms, 1.0, atol=1e-6)


def test_backend_equality():
    from cudadepthmapintegration_tpu import native

    if not native.available():
        pytest.skip("native library not built")
    pv, xs = sphere_points(25)
    a = marching_cubes(pv, 0.0, xs, xs, xs, backend="jax",
                       compute_normals=True)
    b = marching_cubes(pv, 0.0, xs, xs, xs, backend="native",
                       compute_normals=True)
    # Same canonical edge keys -> bit-identical normals.
    assert np.array_equal(a.point_data["Normals"], b.point_data["Normals"])


def test_matrix_rotates_normals():
    pv, xs = sphere_points(21)
    rot = np.eye(4)
    rot[:3, :3] = np.array([[0.0, -1.0, 0.0],
                            [1.0, 0.0, 0.0],
                            [0.0, 0.0, 1.0]])
    plain = marching_cubes(pv, 0.0, xs, xs, xs, compute_normals=True)
    rotated = marching_cubes(pv, 0.0, xs, xs, xs, matrix=rot,
                             compute_normals=True)
    expect = plain.point_data["Normals"] @ rot[:3, :3].T.astype(np.float32)
    np.testing.assert_allclose(
        rotated.point_data["Normals"], expect, atol=1e-6
    )


def test_transform_normals_inverse_transpose():
    # Anisotropic scale: normals must use the inverse-transpose, not the
    # point matrix — a plane x+z=c scaled by (2,1,1) keeps normals
    # proportional to (0.5, 0, 1), NOT (2, 0, 1).
    n = np.array([[1.0, 0.0, 1.0]]) / np.sqrt(2.0)
    m = np.diag([2.0, 1.0, 1.0, 1.0])
    out = transform_normals(n, m)
    expect = np.array([0.5, 0.0, 1.0]) / np.linalg.norm([0.5, 0.0, 1.0])
    np.testing.assert_allclose(out[0], expect, atol=1e-6)
    np.testing.assert_allclose(np.linalg.norm(out, axis=1), 1.0, atol=1e-6)


def test_extract_isosurface_attaches_normals_outward_for_fusion_sign():
    # Fusion scalar is POSITIVE behind the surface (inside the object,
    # rayPotential +rho region, CudaReconstruction.cu:110-118), so
    # -gradient points OUTWARD on fused volumes.
    grid = VoxelGrid(dims=(33, 33, 33), origin=(-1.6, -1.6, -1.6),
                     spacing=(0.1, 0.1, 0.1))
    xs, ys, zs = grid.point_axes(np.float64)
    x, y, z = np.meshgrid(xs, ys, zs, indexing="ij")
    centers = 0.5 * (xs[:-1] + xs[1:])
    cx, cy, cz = np.meshgrid(centers, centers, centers, indexing="ij")
    cell = (1.0 - np.sqrt(cx * cx + cy * cy + cz * cz)).transpose(2, 1, 0)
    mesh = extract_isosurface(grid, cell, 0.0)
    n = mesh.point_data["Normals"]
    radial = mesh.points / np.linalg.norm(mesh.points, axis=1, keepdims=True)
    assert ((n * radial).sum(axis=1) > 0.97).all()


def test_geometric_vertex_normals_single_triangle():
    from cudadepthmapintegration_tpu.ops.normals import (
        geometric_vertex_normals,
    )

    pts = np.array([[0.0, 0, 0], [1.0, 0, 0], [0.0, 1, 0]])
    tris = np.array([[0, 1, 2]])
    n = geometric_vertex_normals(pts, tris)
    np.testing.assert_allclose(n, [[0, 0, 1]] * 3, atol=1e-7)
    # Unreferenced vertex keeps a zero normal.
    n2 = geometric_vertex_normals(np.vstack([pts, [5.0, 5, 5]]), tris)
    np.testing.assert_allclose(n2[3], [0, 0, 0])


def test_sparse_extract_mesh_normals_outward():
    from cudadepthmapintegration_tpu.core import RayPotential
    from cudadepthmapintegration_tpu.ops.sparse_grid import SparseTSDFGrid
    from cudadepthmapintegration_tpu.testing import sphere_scene

    params = RayPotential(thick=0.06, rho=0.8, eta=0.03, delta=0.2)
    views = sphere_scene(n_views=8, width=96, height=72, focal=80.0)
    sparse = SparseTSDFGrid(voxel_size=0.08, params=params, pixel_stride=2)
    for v in views:
        sparse.integrate_frame(v)
    mesh = sparse.extract_mesh(iso=1.0)
    n = mesh.point_data["Normals"]
    assert n.shape == (mesh.num_points, 3)
    # Select the OUTER crossing sheet only: the accumulated potential also
    # recrosses iso=1.0 on its decay side deeper behind the surface, where
    # the gradient (and hence the winding) legitimately points inward.
    near = np.abs(np.linalg.norm(mesh.points, axis=1) - 1.0) < 0.05
    radial = mesh.points[near] / np.linalg.norm(
        mesh.points[near], axis=1, keepdims=True
    )
    dots = (n[near] * radial).sum(axis=1)
    assert near.sum() > 100 and (dots > 0).mean() > 0.95
    assert sparse.extract_mesh(iso=1.0, compute_normals=False).point_data == {}


def test_extract_isosurface_compute_scalars_parity(tmp_path):
    # vtkContourFilter's ComputeScalars default: the output carries the
    # contoured scalar array (constant == iso) under the input name,
    # marked as the active scalars; survives coloration's deep copy.
    from cudadepthmapintegration_tpu.io import read_vtp, write_vtp

    grid = VoxelGrid(dims=(17, 17, 17), origin=(-1.6, -1.6, -1.6),
                     spacing=(0.2, 0.2, 0.2))
    centers = 0.5 * 0.2 + np.arange(16) * 0.2 - 1.6
    cx, cy, cz = np.meshgrid(centers, centers, centers, indexing="ij")
    cell = (1.0 - np.sqrt(cx * cx + cy * cy + cz * cz)).transpose(2, 1, 0)
    mesh = extract_isosurface(grid, cell, 0.25)
    arr = mesh.point_data["reconstruction_scalar"]
    assert arr.dtype == np.float64 and (arr == 0.25).all()
    assert mesh.active_scalars == "reconstruction_scalar"
    path = str(tmp_path / "s.vtp")
    write_vtp(path, mesh)
    back = read_vtp(path)
    assert back.active_scalars == "reconstruction_scalar"
    assert (back.point_data["reconstruction_scalar"] == 0.25).all()
    text = open(path, "rb").read(4096).decode("latin1")
    assert 'Scalars="reconstruction_scalar"' in text


def test_vtp_roundtrip_preserves_normals(tmp_path):
    from cudadepthmapintegration_tpu.io import read_vtp, write_vtp

    pv, xs = sphere_points(17)
    mesh = marching_cubes(pv, 0.0, xs, xs, xs, compute_normals=True)
    path = str(tmp_path / "n.vtp")
    write_vtp(path, mesh)
    back = read_vtp(path)
    np.testing.assert_allclose(
        back.point_data["Normals"], mesh.point_data["Normals"], atol=0
    )
    text = open(path, "rb").read(4096).decode("latin1")
    assert 'Normals="Normals"' in text  # active-attribute marker


def test_empty_extraction_still_carries_normals_array():
    """A no-crossing field must return the same attribute set as a
    1-triangle result: consumers read point_data["Normals"]
    unconditionally when compute_normals=True (the default)."""
    import numpy as np

    from cudadepthmapintegration_tpu.core import VoxelGrid
    from cudadepthmapintegration_tpu.ops.marching_cubes import (
        extract_isosurface,
        marching_cubes,
    )

    vol = np.zeros((4, 4, 4), np.float64)  # never crosses iso=1
    xs = ys = zs = np.arange(5.0)
    mesh = marching_cubes(
        np.zeros((5, 5, 5)), 1.0, xs, ys, zs, compute_normals=True,
        backend="jax",
    )
    assert mesh.point_data["Normals"].shape == (0, 3)
    grid = VoxelGrid(dims=(5, 5, 5), origin=(0, 0, 0), spacing=(1, 1, 1))
    mesh2 = extract_isosurface(grid, vol, 1.0)
    assert mesh2.point_data["Normals"].shape == (0, 3)
    assert mesh2.point_data["reconstruction_scalar"].shape == (0,)
