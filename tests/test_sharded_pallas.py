"""Sharded Pallas fusion (shard_map + interpret-mode kernel on the CPU mesh)."""

import numpy as np

import cudadepthmapintegration_tpu.kernels.integrate_pallas as KP
from cudadepthmapintegration_tpu.core import RayPotential, VoxelGrid
from cudadepthmapintegration_tpu.ops import integrate_views_oracle
from cudadepthmapintegration_tpu.parallel import ShardedTSDFIntegrator, make_mesh
from cudadepthmapintegration_tpu.testing import sphere_scene

KP.INTERPRET = True

PARAMS = RayPotential(thick=0.1, rho=0.8, eta=0.03, delta=0.3)


def test_sharded_pallas_matches_oracle():
    views = sphere_scene(n_views=4, width=144, height=64, focal=60.0)
    grid = VoxelGrid(dims=(17, 17, 17), origin=(-1.6,) * 3, spacing=(0.2,) * 3)
    mesh = make_mesh(n_z=4)
    integ = ShardedTSDFIntegrator(grid, PARAMS, mesh, dtype=np.float32)
    integ.reset().integrate_pallas(views)
    got = integ.result()
    exp = integrate_views_oracle(grid, views, PARAMS)
    assert (np.abs(got - exp.astype(np.float32)) > 1e-3).mean() == 0.0
    shard_shapes = {s.data.shape for s in integ.volume.addressable_shards}
    assert shard_shapes == {(4, 16, 16)}


def test_sharded_pallas_z_block_identical():
    """kz composes with z-slab sharding per shard (bit-identical)."""
    views = sphere_scene(n_views=4, width=144, height=64, focal=60.0)
    grid = VoxelGrid(dims=(17, 17, 17), origin=(-1.6,) * 3, spacing=(0.2,) * 3)
    mesh = make_mesh(n_z=4)
    a = ShardedTSDFIntegrator(grid, PARAMS, mesh, dtype=np.float32)
    a.reset().integrate_pallas(views)
    b = ShardedTSDFIntegrator(grid, PARAMS, mesh, dtype=np.float32)
    b.reset().integrate_pallas(views, z_block=2)  # 4 z-cells/shard -> kz2
    np.testing.assert_array_equal(a.result(), b.result())


def test_sharded_pallas_rowsel3_identical():
    """rowsel3's on-device 3-plane split runs inside the shard_map chain,
    bit-identical to rowsel (split planes reconstruct fp32 exactly)."""
    views = sphere_scene(n_views=4, width=144, height=64, focal=60.0)
    grid = VoxelGrid(dims=(17, 17, 17), origin=(-1.6,) * 3, spacing=(0.2,) * 3)
    mesh = make_mesh(n_z=4)
    a = ShardedTSDFIntegrator(grid, PARAMS, mesh, dtype=np.float32)
    a.reset().integrate_pallas(views)
    b = ShardedTSDFIntegrator(grid, PARAMS, mesh, dtype=np.float32)
    b.reset().integrate_pallas(views, mode="rowsel3")
    np.testing.assert_array_equal(a.result(), b.result())


def test_sharded_pallas_hbm_band_sweep_identical():
    """The HBM band-sweep modes compose with z-slab sharding (no host
    sync in the chain) — bit-identical to the whole-map mode per shard,
    so HD depth maps can fuse sharded without a VMEM ceiling."""
    views = sphere_scene(n_views=4, width=144, height=64, focal=60.0)
    grid = VoxelGrid(dims=(17, 17, 17), origin=(-1.6,) * 3, spacing=(0.2,) * 3)
    mesh = make_mesh(n_z=4)
    a = ShardedTSDFIntegrator(grid, PARAMS, mesh, dtype=np.float32)
    a.reset().integrate_pallas(views)
    for mode in ("rowselh", "rowsel3h"):
        b = ShardedTSDFIntegrator(grid, PARAMS, mesh, dtype=np.float32)
        b.reset().integrate_pallas(views, mode=mode)
        np.testing.assert_array_equal(a.result(), b.result())


def test_sharded_pallas_skip_dead_identical():
    """The dead-unit-skipping kernel variant composes with z-slab
    sharding (a static flag, no host sync) and must be bit-identical —
    z-slabs are exactly the frustum-partial regime the skip targets."""
    views = sphere_scene(n_views=4, width=144, height=64, focal=60.0)
    grid = VoxelGrid(dims=(17, 17, 17), origin=(-1.6,) * 3, spacing=(0.2,) * 3)
    mesh = make_mesh(n_z=4)
    a = ShardedTSDFIntegrator(grid, PARAMS, mesh, dtype=np.float32)
    a.reset().integrate_pallas(views)
    for mode in ("rowsel", "rowsel3"):
        b = ShardedTSDFIntegrator(grid, PARAMS, mesh, dtype=np.float32)
        b.reset().integrate_pallas(views, mode=mode, skip_dead=True)
        np.testing.assert_array_equal(a.result(), b.result())


def test_sharded_pallas_incremental():
    views = sphere_scene(n_views=4, width=144, height=64, focal=60.0)
    grid = VoxelGrid(dims=(17, 17, 17), origin=(-1.6,) * 3, spacing=(0.2,) * 3)
    mesh = make_mesh(n_z=2)
    a = ShardedTSDFIntegrator(grid, PARAMS, mesh, dtype=np.float32)
    a.reset().integrate_pallas(views[:2]).integrate_pallas(views[2:])
    b = ShardedTSDFIntegrator(grid, PARAMS, mesh, dtype=np.float32)
    b.reset().integrate_pallas(views)
    np.testing.assert_allclose(a.result(), b.result(), atol=1e-6)


def test_sharded_pallas_orientation_groups_on_topdown_rig():
    """Cameras looking down -z with varied roll: image-u aligns with x for
    some views and y for others, so the free-axis grouping must split into
    both layouts (canonical + yx-transposed) and still match the oracle."""
    from cudadepthmapintegration_tpu.testing import render_sphere_view
    from cudadepthmapintegration_tpu.testing.synthetic import look_at_camera

    views = []
    for i in range(4):
        ang = i * np.pi / 4  # varied roll: up vector rotates in the xy plane
        up = (np.cos(ang), np.sin(ang), 0.0)
        cam = look_at_camera(
            (0.25, -0.15, 3.5), (0.0, 0.0, 0.0), up=up,
            focal=60.0, width=144, height=64,
        )
        views.append(render_sphere_view(cam, 144, 64))

    grid = VoxelGrid(dims=(17, 17, 17), origin=(-1.6,) * 3, spacing=(0.2,) * 3)
    mesh = make_mesh(n_z=4)
    integ = ShardedTSDFIntegrator(grid, PARAMS, mesh, dtype=np.float32)
    integ.reset().integrate_pallas(views)
    got = integ.result()
    exp = integrate_views_oracle(grid, views, PARAMS)
    assert exp.max() > 0.5
    assert (np.abs(got - exp.astype(np.float32)) > 1e-3).mean() == 0.0

    # The rig genuinely splits across the two free-axis permutations.
    splits = set()
    for view in views:
        rot = (view.camera.rt @ grid.matrix)[:3, :3]
        u_dir, view_dir = np.abs(rot[0]), np.abs(rot[2])
        splits.add(bool(u_dir[1] + view_dir[0] > u_dir[0] + view_dir[1]))
    assert splits == {False, True}


def test_sharded_pallas_frustum_cull_bitwise():
    """Frustum-culled fusion == unculled fusion BITWISE: a culled view
    contributes exactly zero to that slab. The close-up rig guarantees
    some (view, slab) pairs actually cull (asserted), so the test isn't
    vacuous."""
    from cudadepthmapintegration_tpu.parallel.frustum import slab_view_mask
    from cudadepthmapintegration_tpu.testing import (
        orbit_cameras,
        render_sphere_view,
    )

    W, H = 144, 64
    # Distant orbit with a narrow vertical FOV: each view sees only the
    # central z slabs (cameras OUTSIDE the grid so corner z stays > 0 —
    # inside-grid cameras keep everything conservatively).
    cams = orbit_cameras(4, 4.0, focal=300.0, width=W, image_height=H)
    views = [render_sphere_view(c, W, H, radius=1.0, background=-1.0)
             for c in cams]
    grid = VoxelGrid(dims=(17, 17, 17), origin=(-1.6,) * 3, spacing=(0.2,) * 3)
    mesh = make_mesh(n_z=4)
    mask = slab_view_mask(grid, views, 4)
    assert not mask.all(), "rig should cull some (view, slab) pairs"
    assert mask.any(axis=0).all(), "every view should hit some slab"

    a = ShardedTSDFIntegrator(grid, PARAMS, mesh, dtype=np.float32)
    a.reset().integrate_pallas(views)
    b = ShardedTSDFIntegrator(grid, PARAMS, mesh, dtype=np.float32)
    b.reset().integrate_pallas(views, frustum_cull=True)
    np.testing.assert_array_equal(a.result(), b.result())


def test_frustum_mask_is_conservative():
    """Brute force: every voxel that projects validly into a view must lie
    in a slab the mask KEEPS for that view (no false culls, ever)."""
    from cudadepthmapintegration_tpu.core.camera import compose_projection
    from cudadepthmapintegration_tpu.parallel.frustum import slab_view_mask
    from cudadepthmapintegration_tpu.testing import (
        orbit_cameras,
        render_sphere_view,
    )

    W, H = 96, 64
    cams = orbit_cameras(6, 4.0, focal=160.0, width=W, image_height=H)
    views = [render_sphere_view(c, W, H, radius=1.0, background=-1.0)
             for c in cams]
    grid = VoxelGrid(dims=(17, 17, 17), origin=(-1.6,) * 3, spacing=(0.2,) * 3)
    nz = 8
    mask = slab_view_mask(grid, views, nz)
    xs, ys, zs = grid.cell_center_axes(np.float64)
    gx, gy, gz = np.meshgrid(xs, ys, zs, indexing="ij")
    pts = np.stack([gx, gy, gz, np.ones_like(gx)], -1).reshape(-1, 4)
    m = 16 // nz
    for i, view in enumerate(views):
        p_full, _ = compose_projection(view.camera, grid)
        hom = pts @ p_full[:3].T
        with np.errstate(divide="ignore", invalid="ignore"):
            u = np.round(hom[:, 0] / hom[:, 2])
            v = np.round(hom[:, 1] / hom[:, 2])
        valid = (hom[:, 2] >= 0) & (u >= 0) & (v >= 0) & (u < W) & (v < H)
        z_idx = np.broadcast_to(
            np.arange(16)[None, None, :], (16, 16, 16)
        ).reshape(-1)
        hit_slabs = set((z_idx[valid] // m).tolist())
        kept = set(np.flatnonzero(mask[:, i]).tolist())
        assert hit_slabs <= kept, f"view {i}: false cull {hit_slabs - kept}"


def test_slab_interleave_bitwise():
    """Round-robin slab assignment is an exact z-permutation: results are
    bit-identical to contiguous slabs on both the xla and pallas paths."""
    views = sphere_scene(n_views=4, width=144, height=64, focal=60.0)
    grid = VoxelGrid(dims=(17, 17, 17), origin=(-1.6,) * 3, spacing=(0.2,) * 3)
    mesh = make_mesh(n_z=4)
    a = ShardedTSDFIntegrator(grid, PARAMS, mesh, dtype=np.float32)
    a.reset().integrate_pallas(views)
    b = ShardedTSDFIntegrator(
        grid, PARAMS, mesh, dtype=np.float32, slab_interleave=True
    )
    b.reset().integrate_pallas(views)
    np.testing.assert_array_equal(a.result(), b.result())

    c = ShardedTSDFIntegrator(grid, PARAMS, mesh, dtype=np.float64)
    c.reset().integrate(views)
    d = ShardedTSDFIntegrator(
        grid, PARAMS, mesh, dtype=np.float64, slab_interleave=True
    )
    d.reset().integrate(views)
    np.testing.assert_array_equal(c.result(), d.result())

    # Resume seeding round-trips through the permutation too.
    e = ShardedTSDFIntegrator(
        grid, PARAMS, mesh, dtype=np.float64, slab_interleave=True
    )
    e.reset(c.result())
    np.testing.assert_array_equal(e.result(), c.result())
