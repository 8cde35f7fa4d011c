"""Distributed isosurface extraction == single-device extraction, exactly."""

import jax
import numpy as np
import pytest
from jax.sharding import NamedSharding, PartitionSpec as P

from cudadepthmapintegration_tpu.core import RayPotential, VoxelGrid
from cudadepthmapintegration_tpu.ops import integrate_views_oracle
from cudadepthmapintegration_tpu.ops.marching_cubes import extract_isosurface
from cudadepthmapintegration_tpu.parallel import make_mesh, sharded_extract_isosurface
from cudadepthmapintegration_tpu.testing import sphere_scene

PARAMS = RayPotential(thick=0.1, rho=0.8, eta=0.03, delta=0.3)


def fused_volume():
    grid = VoxelGrid(
        dims=(17, 17, 17), origin=(-1.63, -1.61, -1.59), spacing=(0.2, 0.2, 0.2)
    )
    views = sphere_scene(n_views=6, width=64, height=48)
    vol = integrate_views_oracle(grid, views, PARAMS)
    return grid, vol


@pytest.mark.parametrize("n_z", [2, 4, 8])
@pytest.mark.parametrize("backend", ["native", "jax"])
def test_sharded_mesh_matches_single_device(n_z, backend):
    grid, vol = fused_volume()
    single = extract_isosurface(grid, vol, iso=1.0)
    mesh = make_mesh(n_z=n_z)
    sharded_vol = jax.device_put(
        vol.astype(np.float64), NamedSharding(mesh, P("z", None, None))
    )
    dist = sharded_extract_isosurface(sharded_vol, grid, 1.0, mesh, backend=backend)
    assert dist.num_points == single.num_points
    assert dist.num_triangles == single.num_triangles
    np.testing.assert_allclose(dist.points, single.points, atol=1e-9)
    np.testing.assert_array_equal(dist.triangles, single.triangles)
    # Gradient normals: the 1-plane margined slab pulls make the sharded
    # central differences see the same values as the dense path.
    np.testing.assert_array_equal(
        dist.point_data["Normals"], single.point_data["Normals"]
    )


def test_sharded_mesh_empty_volume():
    grid = VoxelGrid(dims=(17, 17, 17), origin=(0, 0, 0), spacing=(1, 1, 1))
    mesh = make_mesh(n_z=4)
    vol = jax.device_put(
        np.zeros(grid.volume_shape), NamedSharding(mesh, P("z", None, None))
    )
    out = sharded_extract_isosurface(vol, grid, 1.0, mesh)
    assert out.num_triangles == 0
