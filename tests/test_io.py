"""I/O round-trips: KRTD, list files, VTI/VTP/MHA, npz views."""

import textwrap

import numpy as np
import pytest

from cudadepthmapintegration_tpu.core.camera import Camera
from cudadepthmapintegration_tpu.io import (
    DepthMapDataset,
    PolyData,
    extract_all_file_paths,
    read_depth_map,
    read_krtd,
    read_mha,
    read_vti,
    read_vtp,
    save_view_npz,
    load_view,
    write_depth_map_vti,
    write_krtd,
    write_mha,
    write_vtp,
)
from cudadepthmapintegration_tpu.io.vti import write_vti
from cudadepthmapintegration_tpu.testing import sphere_scene


def test_krtd_roundtrip(tmp_path):
    k = np.array([[300.0, 0.0, 64.0], [0.0, 310.0, 48.0], [0.0, 0.0, 1.0]])
    rt = np.eye(4)
    rt[:3, :3] = np.array([[0, 1, 0], [0, 0, -1], [-1, 0, 0]], dtype=float)
    rt[:3, 3] = [1.5, -2.25, 3.125]
    path = tmp_path / "cam.krtd"
    write_krtd(path, Camera(k=k, rt=rt))
    cam = read_krtd(path)
    np.testing.assert_array_equal(cam.k, k)
    np.testing.assert_array_equal(cam.rt, rt)


def test_krtd_ignores_distortion(tmp_path):
    # The reference ignores the trailing distortion row (Sources/Helper.h:105-168).
    content = textwrap.dedent(
        """\
        100 0 32
        0 100 24
        0 0 1

        1 0 0
        0 1 0
        0 0 1

        0.5 0.25 0.125

        -0.1 0.01 0 0
        """
    )
    p = tmp_path / "c.krtd"
    p.write_text(content)
    cam = read_krtd(p)
    assert cam.k[0, 0] == 100
    assert cam.rt[0, 3] == 0.5
    assert cam.rt[3, 3] == 1.0


def test_listfile_last_token_and_relative_resolution(tmp_path):
    # help::ExtractAllFilePath takes the LAST whitespace token per line and
    # resolves relative to the list file's own directory (Sources/Helper.h:60-100).
    sub = tmp_path / "data"
    sub.mkdir()
    lf = sub / "vtiList.txt"
    lf.write_text("ignored tokens frame_000.vti\nframe_001.vti\n\n  \nx frame_002.vti\n")
    paths = extract_all_file_paths(lf)
    assert len(paths) == 3
    assert paths[0] == str(sub / "frame_000.vti")
    assert paths[1] == str(sub / "frame_001.vti")
    assert paths[2] == str(sub / "frame_002.vti")


@pytest.mark.parametrize("compress", [False, True])
def test_vti_depthmap_roundtrip(tmp_path, compress):
    view = sphere_scene(n_views=1, width=40, height=30)[0]
    p = str(tmp_path / "dm.vti")
    write_depth_map_vti(
        p, view.depth, color=view.color, best_cost=view.best_cost, compress=compress
    )
    back = read_depth_map(p)
    np.testing.assert_array_equal(back.depth, view.depth)
    np.testing.assert_array_equal(back.color, view.color)
    np.testing.assert_array_equal(back.best_cost, view.best_cost)


def test_vti_ascii_and_binary_formats(tmp_path):
    # Hand-written ascii VTI (the other DataArray formats VTK emits).
    content = """<?xml version="1.0"?>
<VTKFile type="ImageData" version="0.1" byte_order="LittleEndian">
  <ImageData WholeExtent="0 2 0 1 0 0" Origin="0 0 0" Spacing="1 1 1">
    <Piece Extent="0 2 0 1 0 0">
      <PointData>
        <DataArray type="Float64" Name="Depths" format="ascii">
          1 2 3 4 5 6
        </DataArray>
      </PointData>
    </Piece>
  </ImageData>
</VTKFile>
"""
    p = tmp_path / "ascii.vti"
    p.write_text(content)
    img = read_vti(str(p))
    assert img.dims == (3, 2, 1)
    np.testing.assert_array_equal(
        img.point_data["Depths"], [1.0, 2.0, 3.0, 4.0, 5.0, 6.0]
    )


def test_vti_inline_binary(tmp_path):
    # Inline base64 binary with UInt32 header (VTK "binary" format).
    import base64
    data = np.arange(6, dtype=np.float64)
    payload = data.tobytes()
    blob = base64.b64encode(
        np.array([len(payload)], dtype=np.uint32).tobytes() + payload
    ).decode()
    content = f"""<?xml version="1.0"?>
<VTKFile type="ImageData" version="0.1" byte_order="LittleEndian" header_type="UInt32">
  <ImageData WholeExtent="0 2 0 1 0 0" Origin="0 0 0" Spacing="1 1 1">
    <Piece Extent="0 2 0 1 0 0">
      <PointData>
        <DataArray type="Float64" Name="Depths" format="binary">{blob}</DataArray>
      </PointData>
    </Piece>
  </ImageData>
</VTKFile>
"""
    p = tmp_path / "binary.vti"
    p.write_text(content)
    img = read_vti(str(p))
    np.testing.assert_array_equal(img.point_data["Depths"], data)


@pytest.mark.parametrize("compress", [False, True])
def test_vtp_roundtrip(tmp_path, compress):
    pts = np.array([[0, 0, 0], [1, 0, 0], [0, 1, 0], [1, 1, 1]], dtype=np.float64)
    tris = np.array([[0, 1, 2], [1, 3, 2]])
    mesh = PolyData(pts, tris)
    mesh.point_data["MeanColoration"] = np.arange(12, dtype=np.uint8).reshape(4, 3)
    p = str(tmp_path / "mesh.vtp")
    write_vtp(p, mesh, compress=compress)
    back = read_vtp(p)
    np.testing.assert_allclose(back.points, pts, atol=1e-6)
    np.testing.assert_array_equal(back.triangles, tris)
    np.testing.assert_array_equal(
        back.point_data["MeanColoration"], mesh.point_data["MeanColoration"]
    )


@pytest.mark.parametrize("compress", [False, True])
def test_mha_roundtrip(tmp_path, compress):
    vol = np.random.default_rng(1).normal(size=(4, 5, 6)).astype(np.float64)
    p = str(tmp_path / "vol.mha")
    write_mha(p, vol, origin=(1, 2, 3), spacing=(0.5, 0.5, 0.5), compress=compress)
    back, header = read_mha(p)
    np.testing.assert_array_equal(back, vol)
    assert header["DimSize"] == "6 5 4"


def test_npz_view_roundtrip(tmp_path):
    view = sphere_scene(n_views=1, width=32, height=24)[0]
    p = str(tmp_path / "view.npz")
    save_view_npz(p, view)
    back = load_view(p)
    np.testing.assert_array_equal(back.depth, view.depth)
    np.testing.assert_array_equal(back.camera.k, view.camera.k)
    np.testing.assert_array_equal(back.camera.rt, view.camera.rt)


def test_dataset_from_lists(tmp_path):
    views = sphere_scene(n_views=3, width=32, height=24)
    for i, v in enumerate(views):
        write_depth_map_vti(str(tmp_path / f"f{i}.vti"), v.depth, v.color, v.best_cost)
        write_krtd(str(tmp_path / f"f{i}.krtd"), v.camera)
    (tmp_path / "vtiList.txt").write_text("".join(f"f{i}.vti\n" for i in range(3)))
    (tmp_path / "kList.txt").write_text("".join(f"f{i}.krtd\n" for i in range(3)))
    ds = DepthMapDataset.from_folder(str(tmp_path))
    assert len(ds) == 3
    v1 = ds[1]
    np.testing.assert_array_equal(v1.depth, views[1].depth)
    np.testing.assert_allclose(v1.camera.k, views[1].camera.k)
