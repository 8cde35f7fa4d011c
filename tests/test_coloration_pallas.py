"""Pallas coloration kernel (interpret mode) vs the XLA gather path."""

import numpy as np

import cudadepthmapintegration_tpu.kernels.integrate_pallas as KP
from cudadepthmapintegration_tpu.kernels.coloration_pallas import (
    gather_colors_pallas,
)
from cudadepthmapintegration_tpu.ops.coloration import colorize_points
from cudadepthmapintegration_tpu.testing import sphere_scene

KP.INTERPRET = True


def _scene(n_views=3):
    views = sphere_scene(n_views=n_views, width=144, height=64, focal=60.0)
    rng = np.random.default_rng(7)
    for v in views:
        v.color[:] = rng.integers(0, 256, v.color.shape, dtype=np.uint8)
    return views


def test_gather_matches_xla_gather():
    views = _scene()
    rng = np.random.default_rng(1)
    pts = (rng.random((500, 3)) - 0.5) * 7.0
    # Sort by (z, y, x) to mimic mesh raster order (footprint coherence).
    pts = pts[np.lexsort(pts.T)]
    proj = np.stack([(v.camera.k4 @ v.camera.rt)[:3, :] for v in views])
    colors = np.stack([v.color for v in views])
    samples, valid = gather_colors_pallas(
        pts.astype(np.float32), proj, colors
    )
    assert valid.any() and (~valid).any()

    a = colorize_points(pts, views, backend="pallas")
    b = colorize_points(pts, views, backend="xla", dtype=np.float32)
    for x, y in zip(a, b):
        np.testing.assert_array_equal(x, y)


def test_staged_planes_reuse_matches_unstaged():
    from cudadepthmapintegration_tpu.kernels.coloration_pallas import (
        stage_color_planes,
    )

    views = _scene(2)
    rng = np.random.default_rng(5)
    pts = ((rng.random((300, 3)) - 0.5) * 2.0).astype(np.float32)
    proj = np.stack([(v.camera.k4 @ v.camera.rt)[:3, :] for v in views])
    colors = np.stack([v.color for v in views])
    staged = stage_color_planes(colors)
    a = gather_colors_pallas(pts, proj, colors)
    b = gather_colors_pallas(pts, proj, staged)
    c = gather_colors_pallas(pts, proj, staged)  # reuse
    for x, y in zip(a, b):
        np.testing.assert_array_equal(x, y)
    for x, y in zip(b, c):
        np.testing.assert_array_equal(x, y)


def test_point_chunking_reuses_staged_views():
    # Multiple point chunks against the same staged view batch (the
    # staged-cache path in colorize_points) must equal one-shot results.
    views = _scene(2)
    rng = np.random.default_rng(6)
    pts = (rng.random((1000, 3)) - 0.5) * 2.0
    a = colorize_points(pts, views, backend="pallas", chunk=256)
    b = colorize_points(pts, views, backend="xla", chunk=1 << 13,
                        dtype=np.float32)
    for x, y in zip(a, b):
        np.testing.assert_array_equal(x, y)


def test_cli_backend_flag(tmp_path):
    from cudadepthmapintegration_tpu.cli import colorize
    from cudadepthmapintegration_tpu.io import (
        read_vtp,
        write_depth_map_vti,
        write_krtd,
        write_vtp,
    )
    from cudadepthmapintegration_tpu.io.polydata import PolyData

    views = _scene(2)
    folder = tmp_path
    with open(folder / "vtiList.txt", "w") as fv, open(
        folder / "kList.txt", "w"
    ) as fk:
        for i, v in enumerate(views):
            write_depth_map_vti(str(folder / f"d{i}.vti"), v.depth, v.color)
            write_krtd(str(folder / f"c{i}.krtd"), v.camera)
            fv.write(f"d{i}.vti\n")
            fk.write(f"c{i}.krtd\n")
    rng = np.random.default_rng(8)
    pts = (rng.random((200, 3)) - 0.5) * 2.0
    mesh_path = str(folder / "in.vtp")
    write_vtp(mesh_path, PolyData(pts, np.zeros((0, 3), np.int64)))

    outs = {}
    for backend in ("xla", "pallas"):
        out = str(folder / f"out_{backend}.vtp")
        rc = colorize.main(
            ["--input", mesh_path, "--output", out,
             "--vti", str(folder / "vtiList.txt"),
             "--krtd", str(folder / "kList.txt"),
             "--backend", backend, "--compatIntMean"]
        )
        assert rc == 0
        outs[backend] = read_vtp(out)
    for key in ("MeanColoration", "MedianColoration", "NbProjectedDepthMap"):
        np.testing.assert_array_equal(
            outs["xla"].point_data[key], outs["pallas"].point_data[key]
        )


def test_z_test_mode_matches():
    views = _scene(2)
    rng = np.random.default_rng(2)
    pts = (rng.random((130, 3)) - 0.5) * 2.0
    a = colorize_points(pts, views, backend="pallas", z_test=True)
    b = colorize_points(pts, views, backend="xla", z_test=True,
                        dtype=np.float32)
    for x, y in zip(a, b):
        np.testing.assert_array_equal(x, y)


def test_view_block_values_identical():
    """view_block shares a grid step across views; every (view, vertex)
    sample must be unchanged for any vb."""
    import numpy as np

    from cudadepthmapintegration_tpu.kernels.coloration_pallas import (
        gather_colors_pallas,
    )
    from cudadepthmapintegration_tpu.testing import sphere_scene

    views = sphere_scene(n_views=4, width=144, height=64, focal=60.0)
    rng = np.random.default_rng(3)
    pts = rng.normal(scale=0.9, size=(700, 3)).astype(np.float32)
    proj = np.stack([(v.camera.k4 @ v.camera.rt)[:3, :] for v in views])
    colors = np.stack([v.color for v in views])
    ref_s, ref_v = gather_colors_pallas(pts, proj, colors)
    for vb in (2, 4, 3):  # 3 does not divide 4 -> clamps to 1
        s, v = gather_colors_pallas(pts, proj, colors, view_block=vb)
        np.testing.assert_array_equal(s, ref_s)
        np.testing.assert_array_equal(v, ref_v)
