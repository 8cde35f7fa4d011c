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


def _wall_view(eye, wall_depth=8.0, width=96, height=72, focal=80.0):
    """A view whose every pixel sees a wall at constant camera-space depth:
    everything nearer is free space (the dense kernel carves it)."""
    from cudadepthmapintegration_tpu.core import DepthMapView
    from cudadepthmapintegration_tpu.testing.synthetic import look_at_camera

    cam = look_at_camera(eye, (0.0, 0.0, 0.0), focal=focal,
                         width=width, height=height)
    return DepthMapView(
        depth=np.full((height, width), wall_depth), camera=cam, name="wall"
    )


def test_carving_applies_empty_space_votes_to_earlier_blocks():
    """Blocks allocated by the sphere frame lie in the wall frame's free
    space: they must receive the wall's -eta*rho vote (dense parity), which
    band-only (carve=False) fusion misses (CudaReconstruction.cu:114-115)."""
    sphere = sphere_scene(n_views=1, width=96, height=72, focal=80.0)[0]
    wall = _wall_view((0.0, -4.0, 0.0))
    views = [sphere, wall]

    carved = SparseTSDFGrid(voxel_size=0.1, params=PARAMS, pixel_stride=2)
    carved.preallocate([sphere])  # wall band (far plane) stays unallocated
    carved.integrate_frame(sphere)
    carved.integrate_frame(wall)

    dense, grid = carved.to_dense()
    expected = integrate_views_oracle(grid, views, PARAMS).astype(np.float32)
    bz, by, bx = carved.block_shape
    lo, _ = carved.allocated_bounds()
    mask = np.zeros(dense.shape, bool)
    for (cx_, cy_, cz_) in carved.block_map:
        iz, iy, ix = (cz_ - lo[2]) * bz, (cy_ - lo[1]) * by, (cx_ - lo[0]) * bx
        mask[iz : iz + bz, iy : iy + by, ix : ix + bx] = True
    # Preallocated + carved == dense EXACTLY on allocated voxels (fp32).
    np.testing.assert_allclose(dense[mask], expected[mask], atol=2e-5)
    # The scenario genuinely exercises carving: some allocated voxels
    # received the wall's free-space vote.
    assert (expected[mask] < -PARAMS.eta * PARAMS.rho * 0.9).any()

    # Band-only fusion misses those votes.
    bandonly = SparseTSDFGrid(voxel_size=0.1, params=PARAMS, pixel_stride=2)
    bandonly.preallocate([sphere])
    bandonly.integrate_frame(sphere, carve=False)
    bandonly.integrate_frame(wall, carve=False)
    dense_b, _ = bandonly.to_dense()
    assert np.abs(dense_b[mask] - expected[mask]).max() > PARAMS.eta * PARAMS.rho * 0.5


def test_per_block_mesh_matches_dense_extraction():
    """Per-block extraction (halos + global weld keys) must reproduce the
    dense bounding-box extraction exactly where the surface is interior."""
    from cudadepthmapintegration_tpu.ops.marching_cubes import extract_isosurface

    views = sphere_scene(n_views=8, width=96, height=72, focal=80.0)
    sparse = SparseTSDFGrid(voxel_size=0.08, params=PARAMS, pixel_stride=2)
    sparse.preallocate(views)
    for v in views:
        sparse.integrate_frame(v)
    mesh = sparse.extract_mesh(iso=1.0)
    dense, grid = sparse.to_dense()
    ref = extract_isosurface(grid, dense, 1.0)

    assert mesh.num_triangles > 100

    def canon(pd):
        pts = np.round(np.asarray(pd.points, np.float64), 9)
        tris = np.asarray(pd.triangles)
        tri_pts = pts[tris].reshape(len(tris), -1)
        order = np.lexsort(tri_pts.T[::-1])
        return tri_pts[order]

    a, b = canon(mesh), canon(ref)
    # The dense path may add junk sheets at the allocation boundary (the
    # known fabricated-zero artifact) — every sparse triangle must appear
    # in the dense output, and all NEAR-SURFACE dense triangles in sparse.
    assert a.shape[0] <= b.shape[0]
    b_set = {tuple(r) for r in b}
    assert all(tuple(r) in b_set for r in a)
    a_set = {tuple(r) for r in a}
    near = [r for r in b if abs(np.linalg.norm(r[:3]) - 1.0) < 0.3]
    assert near and all(tuple(r) in a_set for r in near)


def test_per_block_mesh_has_no_allocation_boundary_junk():
    """The exact artifact of the round-1 review: a carved (all-negative)
    block next to UNALLOCATED space must emit nothing at iso=0 — the
    fabricated 0.0 of unallocated cells is not data. The dense bounding-box
    densification of the same state emits boundary sheets (the bug being
    guarded against)."""
    import jax.numpy as jnp

    from cudadepthmapintegration_tpu.ops.marching_cubes import extract_isosurface

    sparse = SparseTSDFGrid(voxel_size=0.1, params=PARAMS)
    # Two diagonal blocks so the bounding box contains unallocated space.
    sparse._allocate([(0, 0, 0), (2, 2, 2)])
    sparse.pool = sparse.pool.at[jnp.asarray([0, 1])].set(-1.0)

    mesh = sparse.extract_mesh(iso=0.0)
    assert mesh.num_triangles == 0  # nothing crosses zero in the data

    dense, grid = sparse.to_dense()
    ref = extract_isosurface(grid, dense, 0.0)
    assert ref.num_triangles > 0  # fabricated sheets at the allocation edge


def test_eviction_recycles_slots():
    views = sphere_scene(n_views=4, width=96, height=72, focal=80.0)
    sparse = SparseTSDFGrid(voxel_size=0.1, params=PARAMS, pixel_stride=2)
    for v in views:
        sparse.integrate_frame(v)
    # Plant blocks in free space near the origin-facing axis; two wall
    # views (everything near is free space) drive them to -2*eta*rho,
    # the default evictability floor.
    planted = [(2, -1, -1), (2, 0, -1), (2, -1, 0), (2, 0, 0)]
    sparse._allocate(planted)
    sparse.integrate_frame(_wall_view((0.0, -5.0, 0.0)))
    sparse.integrate_frame(_wall_view((-5.0, 0.0, 0.0)))
    n0 = sparse.num_allocated
    evicted = sparse.evict_deep_free_space()
    assert evicted >= len(planted)
    # Surface-crossing blocks (positive values) survive.
    assert all(tuple(c) not in sparse.block_map for c in planted)
    pool = np.asarray(sparse.pool)
    assert any(
        pool[s].max() > 0.5 for s in sparse.block_map.values()
    )
    assert sparse.num_allocated == n0 - evicted
    assert len(sparse._free_slots) == evicted
    # Evicted slots were zeroed on device.
    pool = np.asarray(sparse.pool)
    for s in sparse._free_slots:
        assert (pool[s] == 0).all()
    # Reallocation reuses freed slots; the mesh still reconstructs.
    for v in views:
        sparse.integrate_frame(v)
    assert sparse._next_slot <= n0 + 1
    mesh = sparse.extract_mesh(iso=1.0)
    assert mesh.num_triangles > 100


def test_evict_far_from_working_set():
    views = sphere_scene(n_views=4, width=96, height=72, focal=80.0)
    sparse = SparseTSDFGrid(voxel_size=0.1, params=PARAMS, pixel_stride=2)
    for v in views:
        sparse.integrate_frame(v)
    n0 = sparse.num_allocated
    # Radius eviction: drop everything farther than 0.9 from the origin.
    evicted = sparse.evict_far_from((0.0, 0.0, 0.0), radius=0.9)
    assert 0 < evicted < n0
    coords = np.array(list(sparse.block_map.keys()), np.float64)
    centers = (coords + 0.5) * sparse._block_extent
    assert (np.linalg.norm(centers, axis=1) <= 0.9 + 1e-9).all()
    # Budget eviction: keep at most 20 blocks, nearest first.
    sparse.evict_far_from((0.0, 0.0, 0.0), radius=float("inf"),
                          keep_at_most=20)
    assert sparse.num_allocated <= 20


def test_online_color_matches_projective_coloration():
    """Online per-block color pool vs the exact second-pass coloration.

    The online scheme averages pixel RGB over every (view, voxel-in-band)
    observation at the NEAREST voxel center; the projective pass gathers at
    the vertex itself. On a smooth shaded sphere the two must agree to
    within the shading's local variation."""
    from cudadepthmapintegration_tpu.ops.coloration import colorize_mesh

    views = sphere_scene(n_views=8, width=96, height=72, focal=80.0)
    sparse = SparseTSDFGrid(
        voxel_size=0.08, params=PARAMS, pixel_stride=2, with_color=True
    )
    for v in views:
        sparse.integrate_frame(v)
    mesh = sparse.extract_colored_mesh(iso=1.0)
    assert "MeanColoration" in mesh.point_data
    assert "ColorWeight" in mesh.point_data
    cnt = mesh.point_data["ColorWeight"]
    online = mesh.point_data["MeanColoration"].astype(np.float64)
    # Nearly every surface vertex was observed online.
    assert (cnt > 0).mean() > 0.98
    # Synthetic shading keeps R >= G >= B per pixel; means preserve it.
    obs = cnt > 0
    assert (online[obs, 0] >= online[obs, 1] - 1).all()
    assert (online[obs, 1] >= online[obs, 2] - 1).all()
    exact = colorize_mesh(mesh, views).point_data["MeanColoration"]
    both = obs & (mesh.point_data.get("NbProjectedDepthMap", cnt) > 0)
    diff = np.abs(online[both] - exact.astype(np.float64)[both])
    # Voxel-center quantization + band-averaged shading: small bias only.
    assert np.median(diff) < 12
    assert diff.mean() < 20


def test_online_color_pools_reset_on_eviction():
    views = sphere_scene(n_views=4, width=96, height=72, focal=80.0)
    sparse = SparseTSDFGrid(
        voxel_size=0.1, params=PARAMS, pixel_stride=2, with_color=True
    )
    for v in views:
        sparse.integrate_frame(v)
    assert float(np.asarray(sparse.weight_pool).sum()) > 0
    evicted = sparse.evict_far_from((0.0, 0.0, 0.0), radius=0.0)
    assert evicted == sparse._free_slots.__len__()
    w = np.asarray(sparse.weight_pool)
    c = np.asarray(sparse.color_pool)
    for s in sparse._free_slots:
        assert (w[s] == 0).all() and (c[s] == 0).all()


def test_vertex_colors_requires_with_color():
    sparse = SparseTSDFGrid(voxel_size=0.1, params=PARAMS)
    with pytest.raises(ValueError, match="with_color"):
        sparse.vertex_colors(np.zeros((1, 3)))
