"""End-to-end: synthetic sphere dataset on disk -> reconstruction CLI ->
mesh approximates the sphere -> coloration CLI -> colored mesh.

This is BASELINE.json config 1 (64^3-ish grid, synthetic depth maps, CPU
parity path)."""

import os

import numpy as np
import pytest

from cudadepthmapintegration_tpu.cli import colorize, reconstruct
from cudadepthmapintegration_tpu.io import read_mha, read_vtp, write_depth_map_vti, write_krtd
from cudadepthmapintegration_tpu.pipeline import (
    ReconstructionConfig,
    ReconstructionPipeline,
)
from cudadepthmapintegration_tpu.testing import sphere_scene


@pytest.fixture(scope="module")
def sphere_dataset(tmp_path_factory):
    folder = tmp_path_factory.mktemp("scene")
    views = sphere_scene(n_views=8, width=96, height=72, focal=90.0)
    for i, v in enumerate(views):
        write_depth_map_vti(
            str(folder / f"frame_{i:03d}.vti"), v.depth, v.color, v.best_cost
        )
        write_krtd(str(folder / f"frame_{i:03d}.krtd"), v.camera)
    (folder / "vtiList.txt").write_text(
        "".join(f"frame_{i:03d}.vti\n" for i in range(len(views)))
    )
    (folder / "kList.txt").write_text(
        "".join(f"frame_{i:03d}.krtd\n" for i in range(len(views)))
    )
    return folder, views


def test_reconstruction_cli_end_to_end(sphere_dataset, tmp_path, monkeypatch):
    folder, views = sphere_dataset
    mesh_path = str(tmp_path / "out.vtp")
    grid_path = str(tmp_path / "out.vts")
    mha_path = str(tmp_path / "vol.mha")
    rc = reconstruct.main(
        [
            "--gridDims", "32",
            "--gridOrigin", "-1.6", "-1.6", "-1.6",
            "--gridEnd", "1.6", "1.6", "1.6",
            "--rayThick", "0.1", "--rayRho", "0.8",
            "--rayEta", "0.03", "--rayDelta", "0.3",
            "--threshBestCost", "0.5",
            "--contour", "1.0",
            "--dataFolder", str(folder),
            "--outputMeshFilename", mesh_path,
            "--outputGridFilename", grid_path,
            "--mhaPath", mha_path,
            "--summary",
            "--dtype", "float64",
        ]
    )
    assert rc == 0
    assert os.path.exists(mesh_path)
    assert os.path.exists(grid_path)
    assert os.path.exists(mha_path)
    assert os.path.exists(folder / "summary.txt")

    mesh = read_vtp(mesh_path)
    assert mesh.num_triangles > 200
    radii = np.linalg.norm(mesh.points, axis=1)
    # TSDF zero crossing should sit near the unit sphere (voxel h = 0.1).
    assert abs(np.median(radii) - 1.0) < 0.08
    assert radii.max() < 1.35 and radii.min() > 0.6

    vol, header = read_mha(mha_path)
    assert vol.shape == (32, 32, 32)  # point dims of a 32-dims grid

    # Now coloration CLI on the produced mesh.
    out_path = str(tmp_path / "colored.vtp")
    rc = colorize.main(
        [
            "--input", mesh_path,
            "--output", out_path,
            "--vti", str(folder / "vtiList.txt"),
            "--krtd", str(folder / "kList.txt"),
        ]
    )
    assert rc == 0
    colored = read_vtp(out_path)
    assert colored.num_points == mesh.num_points
    counts = colored.point_data["NbProjectedDepthMap"]
    mean = colored.point_data["MeanColoration"].reshape(-1, 3)
    assert counts.max() >= 4  # sphere vertices visible from several views
    assert mean.max() > 50  # shaded sphere colors actually sampled


def test_cli_validation_errors(tmp_path):
    base = [
        "--gridOrigin", "0", "0", "0",
        "--dataFolder", str(tmp_path),
        "--outputMeshFilename", str(tmp_path / "m.vtp"),
        "--outputGridFilename", str(tmp_path / "g.vts"),
    ]
    # dims+spacing both set
    assert reconstruct.main(base + ["--gridDims", "10", "--gridSpacing", "1", "1", "1"]) == 1
    # delta < thick
    assert (
        reconstruct.main(
            base + ["--gridDims", "10", "--gridEnd", "1", "1", "1",
                    "--rayThick", "2.0", "--rayDelta", "0.3"]
        )
        == 1
    )
    # eta out of range
    assert (
        reconstruct.main(
            base + ["--gridDims", "10", "--gridEnd", "1", "1", "1",
                    "--rayThick", "0.1", "--rayDelta", "0.3", "--rayEta", "2.0"]
        )
        == 1
    )
    # bad extension
    assert (
        reconstruct.main(
            [
                "--gridOrigin", "0", "0", "0",
                "--dataFolder", str(tmp_path),
                "--outputMeshFilename", str(tmp_path / "m.obj"),
                "--outputGridFilename", str(tmp_path / "g.vts"),
                "--gridDims", "10", "--gridEnd", "1", "1", "1",
                "--rayThick", "0.1", "--rayDelta", "0.3",
            ]
        )
        == 1
    )
    # extension must be an exact suffix, not a substring ("g.vts.bak" was
    # accepted by the substring check; tightened round 4)
    assert (
        reconstruct.main(
            [
                "--gridOrigin", "0", "0", "0",
                "--dataFolder", str(tmp_path),
                "--outputMeshFilename", str(tmp_path / "m.vtp"),
                "--outputGridFilename", str(tmp_path / "g.vts.bak"),
                "--gridDims", "10", "--gridEnd", "1", "1", "1",
                "--rayThick", "0.1", "--rayDelta", "0.3",
            ]
        )
        == 1
    )
    # non-orthogonal grid vectors
    assert (
        reconstruct.main(
            base
            + ["--gridDims", "10", "--gridEnd", "1", "1", "1",
               "--rayThick", "0.1", "--rayDelta", "0.3",
               "--gridVecX", "1", "0", "0", "--gridVecY", "1", "1", "0"]
        )
        == 1
    )
    # missing gridEnd (reference UB -> our clean error)
    assert reconstruct.main(base + ["--gridDims", "10"]) == 1


def test_griddims_broadcast_single_value():
    args = reconstruct.build_parser().parse_args(
        [
            "--gridDims", "17",
            "--gridOrigin", "0", "0", "0",
            "--gridEnd", "1", "1", "1",
            "--rayThick", "0.1",  # defaults violate delta>=thick, as in ref
            "--dataFolder", "x",
            "--outputMeshFilename", "m.vtp",
            "--outputGridFilename", "g.vts",
        ]
    )
    assert reconstruct._validate(args) is None
    assert args.gridDims == [17, 17, 17]


def test_pipeline_resume(sphere_dataset):
    # Checkpoint-by-volume: fusing in two runs (seeding the second with the
    # first's volume) equals one run.
    folder, views = sphere_dataset
    config = ReconstructionConfig(
        grid_dims=(17, 17, 17),
        grid_spacing=(0.2, 0.2, 0.2),
        grid_origin=(-1.7, -1.7, -1.7),
        ray_thick=0.1,
        ray_rho=0.8,
        ray_eta=0.03,
        ray_delta=0.3,
        contour_value=0.0,
        dtype="float64",
        write_mha_path=None,
    )
    pipe = ReconstructionPipeline(config)
    full = pipe.run(views, output_mesh_path=None, output_grid_path=None)
    first, _ = pipe.fuse(views[:4])
    second = pipe.run(views[4:], initial=first.result())
    np.testing.assert_allclose(second.volume, full.volume, atol=1e-12)


def test_pipeline_checkpointed_fusion_resumes(sphere_dataset, tmp_path):
    """checkpoint_path fuses via the fault-tolerant runner: results equal
    the plain run, the checkpoint file exists, and a re-run resumes with
    ZERO units re-fused (the integrator is never invoked again)."""
    folder, views = sphere_dataset
    kw = dict(
        grid_dims=(17, 17, 17),
        grid_spacing=(0.2, 0.2, 0.2),
        grid_origin=(-1.7, -1.7, -1.7),
        ray_thick=0.1,
        ray_delta=0.3,
        threshold_best_cost=0.5,
        write_mha_path=None,
        stream_batch=3,  # several units over 8 views
    )
    plain = ReconstructionPipeline(ReconstructionConfig(**kw))
    ref, _ = plain.fuse(views)

    ck = str(tmp_path / "fusion.ckpt.npz")
    cfg = ReconstructionConfig(checkpoint_path=ck, **kw)
    pipe = ReconstructionPipeline(cfg)
    got, _ = pipe.fuse(views)
    np.testing.assert_allclose(
        np.asarray(got.result()), np.asarray(ref.result()), atol=1e-6
    )
    assert os.path.exists(ck)

    # Resume: all units complete -> integrate must not run again.
    pipe2 = ReconstructionPipeline(cfg)
    calls = []
    import cudadepthmapintegration_tpu.ops.integrate as I

    orig = I.TSDFIntegrator.integrate
    I.TSDFIntegrator.integrate = lambda *a, **k: calls.append(1)
    try:
        got2, _ = pipe2.fuse(views)
    finally:
        I.TSDFIntegrator.integrate = orig
    assert calls == []
    np.testing.assert_allclose(
        np.asarray(got2.result()), np.asarray(ref.result()), atol=1e-6
    )

    # initial + checkpoint are mutually exclusive.
    import pytest

    with pytest.raises(ValueError):
        pipe2.fuse(views, initial=np.zeros((16, 16, 16), np.float32))
