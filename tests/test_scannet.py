"""ScanNet .sens reader: synthetic stream round-trip + fusion geometry."""

import struct
import zlib

import numpy as np

from cudadepthmapintegration_tpu.io.scannet import ScanNetSensDataset
from cudadepthmapintegration_tpu.testing import sphere_scene


def write_sens(path, views, depth_shift=1000.0, color_mode="png",
               color_images=None, intrinsic_color=None):
    """Encode DepthMapViews as a ScanNet v4 .sens stream.

    ``color_images``/``intrinsic_color`` emulate real ScanNet where the
    color stream has its own (higher) resolution and intrinsics; defaults
    reuse the per-view color at depth resolution.
    """
    v0 = views[0]
    h, w = v0.depth.shape
    if color_images is None:
        color_images = [v.color for v in views]
    ch, cw = color_images[0].shape[:2]
    k4 = np.eye(4, dtype=np.float32)
    k4[:3, :3] = v0.camera.k
    k4c = k4 if intrinsic_color is None else np.asarray(
        intrinsic_color, np.float32
    )
    with open(path, "wb") as f:
        f.write(struct.pack("<I", 4))
        name = b"synthetic"
        f.write(struct.pack("<Q", len(name)) + name)
        for m in (k4c, np.eye(4, dtype=np.float32), k4, np.eye(4, dtype=np.float32)):
            f.write(np.asarray(m, np.float32).tobytes())
        f.write(struct.pack("<ii", 1 if color_mode == "png" else 0, 1))
        f.write(struct.pack("<IIII", cw, ch, w, h))
        f.write(struct.pack("<f", depth_shift))
        f.write(struct.pack("<Q", len(views)))
        for v, cimg in zip(views, color_images):
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
                Image.fromarray(cimg).save(buf, format="PNG")
                color_payload = buf.getvalue()
            else:
                color_payload = cimg.tobytes()
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


def test_sens_color_views_native_intrinsics(tmp_path):
    """color_views() projects with intrinsic_color against the FULL-res
    image: verified against a manual fp64 projection/gather of a
    coordinate-encoding color image at 2x depth resolution."""
    from cudadepthmapintegration_tpu.ops.coloration import colorize_points

    views = sphere_scene(n_views=3, width=64, height=48, focal=60.0)
    h, w = 48, 64
    ch, cw = 2 * h, 2 * w
    # Color encodes its own pixel coordinates (exact-gather witness).
    yy, xx = np.mgrid[0:ch, 0:cw]
    cimg = np.stack([xx % 256, yy % 256, (xx // 256 + 2 * (yy // 256)) * 40],
                    axis=-1).astype(np.uint8)
    k4c = np.eye(4)
    k4c[:3, :3] = np.diag([2.0, 2.0, 1.0]) @ views[0].camera.k
    path = str(tmp_path / "hires.sens")
    write_sens(path, views, color_images=[cimg] * 3, intrinsic_color=k4c)

    ds = ScanNetSensDataset(path)
    cviews = ds.color_views()
    assert len(cviews) == 3
    assert cviews[0].depth.shape == (ch, cw)
    assert cviews[0].color.shape == (ch, cw, 3)

    rng = np.random.default_rng(7)
    pts = rng.normal(size=(200, 3))
    pts /= np.linalg.norm(pts, axis=1, keepdims=True)

    # Manual fp64 oracle: project -> round half away -> bounds -> gather.
    samples = np.zeros((3, 200, 3), np.float64)
    valid = np.zeros((3, 200), bool)
    for vi in range(3):
        cam = cviews[vi].camera
        proj = (cam.k4 @ cam.rt)[:3, :]
        hom = pts @ proj[:, :3].T + proj[:, 3]
        u = hom[:, 0] / hom[:, 2]
        v = hom[:, 1] / hom[:, 2]
        pu = (np.sign(u) * np.floor(np.abs(u) + 0.5)).astype(int)
        pv = (np.sign(v) * np.floor(np.abs(v) + 0.5)).astype(int)
        ok = (pu >= 0) & (pv >= 0) & (pu < cw) & (pv < ch)
        valid[vi] = ok
        samples[vi][ok] = cimg[pv[ok], pu[ok]]
    counts = valid.sum(axis=0)
    means = np.zeros((200, 3))
    np.divide(
        (samples * valid[..., None]).sum(axis=0),
        np.maximum(counts[:, None], 1),
        out=means,
    )

    mean_u8, _, got_counts = colorize_points(
        pts, cviews, view_chunk=2, dtype=np.float64
    )
    np.testing.assert_array_equal(got_counts, counts)
    np.testing.assert_array_equal(mean_u8, means.astype(np.uint8))


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
