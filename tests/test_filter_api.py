"""Filter-style embedding API (vtkCudaReconstructionFilter parity)."""

import numpy as np
import pytest

from cudadepthmapintegration_tpu.core import RayPotential, VoxelGrid
from cudadepthmapintegration_tpu.io import write_depth_map_vti, write_krtd
from cudadepthmapintegration_tpu.ops import integrate_views_oracle
from cudadepthmapintegration_tpu.pipeline import ReconstructionFilter
from cudadepthmapintegration_tpu.testing import sphere_scene


@pytest.fixture()
def scene_on_disk(tmp_path):
    views = sphere_scene(n_views=4, width=64, height=48)
    for i, v in enumerate(views):
        write_depth_map_vti(str(tmp_path / f"f{i}.vti"), v.depth, v.color, v.best_cost)
        write_krtd(str(tmp_path / f"f{i}.krtd"), v.camera)
    (tmp_path / "vtiList.txt").write_text("".join(f"f{i}.vti\n" for i in range(4)))
    (tmp_path / "kList.txt").write_text("".join(f"f{i}.krtd\n" for i in range(4)))
    return tmp_path, views


def test_filter_matches_oracle(scene_on_disk):
    folder, views = scene_on_disk
    f = (
        ReconstructionFilter()
        .set_ray_potential_rho(0.8)
        .set_ray_potential_thickness(0.1)
        .set_ray_potential_eta(0.03)
        .set_ray_potential_delta(0.3)
        .set_threshold_best_cost(0.5)
        .set_file_path_vti(str(folder / "vtiList.txt"))
        .set_file_path_krtd(str(folder / "kList.txt"))
        .set_input_grid(
            dims=(17, 17, 17), origin=(-1.6, -1.6, -1.6), spacing=(0.2, 0.2, 0.2)
        )
        .update()
    )
    vol = f.get_output_volume()
    assert f.get_execution_time() > 0
    grid = VoxelGrid(dims=(17, 17, 17), origin=(-1.6,) * 3, spacing=(0.2,) * 3)
    params = RayPotential(thick=0.1, rho=0.8, eta=0.03, delta=0.3)
    exp = integrate_views_oracle(grid, views, params, threshold_best_cost=0.5)
    err = np.abs(vol - exp.astype(np.float32))
    assert np.median(err) < 1e-5


def test_filter_error_when_paths_missing():
    f = ReconstructionFilter().set_ray_potential_rho(0.8)
    with pytest.raises(ValueError, match="inputs have not been set"):
        f.update()


def test_filter_error_when_potential_unset(scene_on_disk):
    folder, _ = scene_on_disk
    f = (
        ReconstructionFilter()
        .set_file_path_vti(str(folder / "vtiList.txt"))
        .set_file_path_krtd(str(folder / "kList.txt"))
        .set_input_grid(dims=(9, 9, 9), origin=(0, 0, 0), spacing=(1, 1, 1))
    )
    with pytest.raises(ValueError, match="Rho or Thickness"):
        f.update()
