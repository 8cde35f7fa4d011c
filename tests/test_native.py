"""Native C++ runtime components vs their Python/JAX counterparts."""

import base64 as pybase64
import numpy as np
import pytest

from cudadepthmapintegration_tpu import native
from cudadepthmapintegration_tpu.core import RayPotential, VoxelGrid
from cudadepthmapintegration_tpu.ops import integrate_views_oracle
from cudadepthmapintegration_tpu.ops.marching_cubes import marching_cubes
from cudadepthmapintegration_tpu.testing import sphere_scene

pytestmark = pytest.mark.skipif(
    not native.available(), reason="native library not built"
)

PARAMS = RayPotential(thick=0.1, rho=0.8, eta=0.03, delta=0.3)


def test_base64_roundtrip():
    rng = np.random.default_rng(0)
    for n in (0, 1, 2, 3, 100, 1000):
        data = rng.integers(0, 256, n, dtype=np.uint8).tobytes()
        enc = native.base64_encode(data)
        assert enc == pybase64.b64encode(data).decode()
        assert native.base64_decode(enc) == data
    # Whitespace tolerated, junk rejected.
    assert native.base64_decode("aGVs\nbG8=") == b"hello"
    with pytest.raises(ValueError):
        native.base64_decode("a!b")


def test_zlib_blocks_roundtrip():
    import zlib

    rng = np.random.default_rng(1)
    payload = rng.integers(0, 50, 100000, dtype=np.uint8).tobytes()
    block = 32768
    nblocks = -(-len(payload) // block)
    chunks = [
        zlib.compress(payload[i * block : (i + 1) * block]) for i in range(nblocks)
    ]
    out = native.zlib_decode_blocks(
        b"".join(chunks), np.array([len(c) for c in chunks], np.int64), len(payload)
    )
    assert out == payload


def test_native_integrate_matches_numpy_oracle():
    views = sphere_scene(n_views=4, width=64, height=48)
    grid = VoxelGrid(dims=(17, 17, 17), origin=(-1.6,) * 3, spacing=(0.2,) * 3)
    exp = integrate_views_oracle(grid, views, PARAMS)
    got = native.integrate_f64(grid, views, PARAMS)
    np.testing.assert_allclose(got, exp, atol=1e-12)
    # threaded == single-thread
    got1 = native.integrate_f64(grid, views, PARAMS, n_threads=1)
    np.testing.assert_array_equal(got, got1)


def test_native_integrate_resume():
    views = sphere_scene(n_views=4, width=64, height=48)
    grid = VoxelGrid(dims=(9, 9, 9), origin=(-1.6,) * 3, spacing=(0.4,) * 3)
    full = native.integrate_f64(grid, views, PARAMS)
    part = native.integrate_f64(grid, views[:2], PARAMS)
    resumed = native.integrate_f64(grid, views[2:], PARAMS, initial=part)
    np.testing.assert_allclose(resumed, full, atol=1e-12)


def test_native_marching_cubes_matches_jax():
    n = 21
    xs = np.linspace(-1.6, 1.6, n)
    gx, gy, gz = np.meshgrid(xs, xs, xs, indexing="ij")
    vals = (np.sqrt(gx**2 + gy**2 + gz**2) - 1.0).transpose(2, 1, 0)
    a = marching_cubes(vals, 0.0, xs, xs, xs, backend="jax")
    b = marching_cubes(vals, 0.0, xs, xs, xs, backend="native")
    assert a.num_points == b.num_points
    assert a.num_triangles == b.num_triangles
    # Weld keys are identical, so vertex ordering matches exactly.
    np.testing.assert_allclose(a.points, b.points, atol=1e-12)
    np.testing.assert_array_equal(a.triangles, b.triangles)


def test_native_mc_capacity_growth():
    # Force the retry path with a surface bigger than the initial capacity.
    n = 41
    xs = np.linspace(-1.6, 1.6, n)
    gx, gy, gz = np.meshgrid(xs, xs, xs, indexing="ij")
    vals = (np.sqrt(gx**2 + gy**2 + gz**2) - 1.0).transpose(2, 1, 0)
    verts, keys = native.marching_cubes_f64(vals, 0.0, xs, xs, xs)
    assert verts.shape[0] > 1024  # grew beyond the initial capacity
    assert verts.shape[0] == keys.shape[0]
