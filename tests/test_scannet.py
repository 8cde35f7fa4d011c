"""ScanNet .sens reader: synthetic stream round-trip + fusion geometry."""

import struct
import zlib

import numpy as np

from cudadepthmapintegration_tpu.io.scannet import ScanNetSensDataset
from cudadepthmapintegration_tpu.testing import sphere_scene


def write_sens(path, views, depth_shift=1000.0, color_mode="png"):
    """Encode DepthMapViews as a ScanNet v4 .sens stream."""
    v0 = views[0]
    h, w = v0.depth.shape
    with open(path, "wb") as f:
        f.write(struct.pack("<I", 4))
        name = b"synthetic"
        f.write(struct.pack("<Q", len(name)) + name)
        k4 = np.eye(4, dtype=np.float32)
        k4[:3, :3] = v0.camera.k
        for m in (k4, np.eye(4, dtype=np.float32), k4, np.eye(4, dtype=np.float32)):
            f.write(np.asarray(m, np.float32).tobytes())
        f.write(struct.pack("<ii", 1 if color_mode == "png" else 0, 1))
        f.write(struct.pack("<IIII", w, h, w, h))
        f.write(struct.pack("<f", depth_shift))
        f.write(struct.pack("<Q", len(views)))
        for v in views:
            rt = v.camera.rt
            pose_cw = np.linalg.inv(rt).astype(np.float32)  # camera->world
            f.write(pose_cw.tobytes())
            f.write(struct.pack("<QQ", 0, 0))
            d = np.where(v.depth < 0, 0.0, v.depth)
            d16 = np.round(d * depth_shift).astype(np.uint16)
            depth_payload = zlib.compress(d16.tobytes())
            if color_mode == "png":
                import io as _io

                from PIL import Image

                buf = _io.BytesIO()
                Image.fromarray(v.color).save(buf, format="PNG")
                color_payload = buf.getvalue()
            else:
                color_payload = v.color.tobytes()
            f.write(struct.pack("<QQ", len(color_payload), len(depth_payload)))
            f.write(color_payload)
            f.write(depth_payload)


def test_sens_roundtrip(tmp_path):
    views = sphere_scene(n_views=3, width=64, height=48)
    path = str(tmp_path / "scene.sens")
    write_sens(path, views)
    ds = ScanNetSensDataset(path)
    assert len(ds) == 3
    assert ds.sensor_name == "synthetic"
    for i, v in enumerate(views):
        got = ds[i]
        # Depth quantized to 1/1000 m; invalid sentinel preserved exactly.
        inv = v.depth < 0
        np.testing.assert_array_equal(got.depth[inv], -1.0)
        np.testing.assert_allclose(
            got.depth[~inv], v.depth[~inv], atol=0.5 / 1000
        )
        np.testing.assert_array_equal(got.color, v.color)  # png lossless
        np.testing.assert_allclose(got.camera.k, v.camera.k, atol=1e-6)
        np.testing.assert_allclose(got.camera.rt, v.camera.rt, atol=1e-6)


def test_sens_raw_color(tmp_path):
    views = sphere_scene(n_views=1, width=32, height=24)
    path = str(tmp_path / "raw.sens")
    write_sens(path, views, color_mode="raw")
    ds = ScanNetSensDataset(path)
    np.testing.assert_array_equal(ds[0].color, views[0].color)


def test_sens_fusion_recovers_sphere(tmp_path):
    from cudadepthmapintegration_tpu.core import RayPotential
    from cudadepthmapintegration_tpu.ops.sparse_grid import SparseTSDFGrid

    views = sphere_scene(n_views=6, width=96, height=72, focal=80.0)
    path = str(tmp_path / "fuse.sens")
    write_sens(path, views)
    ds = ScanNetSensDataset(path)
    params = RayPotential(thick=0.06, rho=0.8, eta=0.03, delta=0.2)
    sparse = SparseTSDFGrid(voxel_size=0.08, params=params, pixel_stride=2)
    for i in range(len(ds)):
        sparse.integrate_frame(ds[i])
    mesh = sparse.extract_mesh(iso=1.0)
    assert mesh.num_triangles > 100
    radii = np.linalg.norm(mesh.points, axis=1)
    assert abs(np.median(radii) - 1.0) < 0.08
