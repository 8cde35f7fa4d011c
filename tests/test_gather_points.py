"""Point-gather Pallas kernel parity (interpreter mode on CPU).

The kernel is the sparse path's replacement for XLA's serialized image
gather; on hardware it compiles via Mosaic (validated by the bench sparse
stage + scripts/tpu_missmode_validate.py successors)."""

import numpy as np

import cudadepthmapintegration_tpu.kernels.integrate_pallas as KP
from cudadepthmapintegration_tpu.core import RayPotential
from cudadepthmapintegration_tpu.kernels.gather_points import (
    gather_pixels_pallas,
)
from cudadepthmapintegration_tpu.ops.sparse_grid import SparseTSDFGrid
from cudadepthmapintegration_tpu.testing import sphere_scene

KP.INTERPRET = True

PARAMS = RayPotential(thick=0.1, rho=0.8, eta=0.03, delta=0.3)


def test_gather_matches_direct_indexing():
    rng = np.random.default_rng(3)
    h, w = 37, 150  # deliberately unaligned
    img = rng.standard_normal((h, w)).astype(np.float32)
    img2 = rng.standard_normal((h, w)).astype(np.float32)
    n = 1500
    # Coherent-ish indices with scattered outliers and invalid entries.
    base_v = np.clip((np.arange(n) // 64) % h, 0, h - 1)
    vi = np.clip(base_v + rng.integers(-2, 3, n), 0, h - 1).astype(np.int32)
    ui = rng.integers(0, w, n).astype(np.int32)
    ui[::97] = -1  # invalid sentinel
    out, out2 = gather_pixels_pallas(
        (img, img2), ui, vi, window_rows=16, n_wc=1, n_k=2
    )
    out, out2 = np.asarray(out), np.asarray(out2)
    valid = ui >= 0
    np.testing.assert_array_equal(out[valid], img[vi[valid], ui[valid]])
    np.testing.assert_array_equal(out2[valid], img2[vi[valid], ui[valid]])
    assert (out[~valid] == -1.0).all()


def test_gather_random_indices_exact():
    # Fully random (worst-case) indices still gather exactly via the
    # remainder walk.
    rng = np.random.default_rng(11)
    h, w = 64, 128
    img = rng.standard_normal((h, w)).astype(np.float32)
    n = 1024
    vi = rng.integers(0, h, n).astype(np.int32)
    ui = rng.integers(0, w, n).astype(np.int32)
    (out,) = gather_pixels_pallas((img,), ui, vi)
    np.testing.assert_array_equal(np.asarray(out), img[vi, ui])


def test_sparse_grid_pallas_backend_matches_xla():
    """The Pallas point-gather reads the SAME pixels as the XLA take (the
    gather itself is bit-exact — see the unit tests above); pool values may
    differ by float reassociation only, because use_pallas is a static arg
    and XLA fuses the surrounding projection math differently per program
    (measured ~1e-6 on the ray-potential ramps)."""
    views = sphere_scene(n_views=3, width=96, height=72, focal=90.0)
    kw = dict(voxel_size=0.08, params=PARAMS, pixel_stride=2,
              with_color=True)
    a = SparseTSDFGrid(gather_backend="xla", **kw)
    b = SparseTSDFGrid(gather_backend="pallas", **kw)
    for v in views:
        a.integrate_frame(v)
        b.integrate_frame(v)
    assert a.num_allocated == b.num_allocated
    # Pool slot assignment may differ (Morton allocation order); compare
    # per block coordinate.
    pa, pb = np.asarray(a.pool), np.asarray(b.pool)
    wa, wb = np.asarray(a.weight_pool), np.asarray(b.weight_pool)
    ca, cb = np.asarray(a.color_pool), np.asarray(b.color_pool)
    for coord, slot_a in a.block_map.items():
        slot_b = b.block_map[coord]
        np.testing.assert_allclose(pa[slot_a], pb[slot_b], atol=2e-5)
        np.testing.assert_allclose(wa[slot_a], wb[slot_b], atol=2e-5)
        np.testing.assert_allclose(ca[slot_a], cb[slot_b], atol=5e-3)
