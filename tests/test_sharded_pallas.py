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
