"""Hardware validation + micro-bench of the Pallas coloration kernel.

Parity: colorize_points(backend='pallas') vs the XLA gather path on the
chip. Perf: raw gather-stage throughput (vertex-color samples/s) of the
packed-RGB rowsel kernel vs the XLA take_along_axis path at capstone-ish
shape (256k mesh-ordered vertices x 64 views of 512^2).
"""

import sys
import time

import numpy as np

sys.path.insert(0, ".")

import jax.numpy as jnp

from cudadepthmapintegration_tpu.kernels.coloration_pallas import (
    gather_colors_pallas,
)
from cudadepthmapintegration_tpu.ops.coloration import (
    _gather_chunk,
    colorize_points,
)
from cudadepthmapintegration_tpu.testing import sphere_scene


def mesh_ordered_points(n, rng):
    pts = (rng.random((n, 3)) - 0.5) * 2.4
    return pts[np.lexsort(pts.T)]


def main():
    rng = np.random.default_rng(3)
    views = sphere_scene(n_views=8, width=256, height=192, focal=150.0)
    for v in views:
        v.color[:] = rng.integers(0, 256, v.color.shape, dtype=np.uint8)

    # --- parity on hardware -------------------------------------------
    pts = mesh_ordered_points(4000, rng)
    a = colorize_points(pts, views, backend="pallas")
    b = colorize_points(pts, views, backend="xla", dtype=np.float32)
    ok = all(np.array_equal(x, y) for x, y in zip(a, b))
    print(f"{'PASS' if ok else 'FAIL'} pallas==xla coloration "
          f"(4000 verts x 8 views)", flush=True)
    if not ok:
        for name, x, y in zip(("mean", "median", "count"), a, b):
            print(f"  {name}: mismatches {(x != y).sum()}", flush=True)

    # --- gather-stage throughput --------------------------------------
    n, nv, w, h = 1 << 18, 64, 512, 512
    big_views = sphere_scene(n_views=nv, width=w, height=h, focal=300.0)
    for v in big_views:
        v.color[:] = rng.integers(0, 256, v.color.shape, dtype=np.uint8)
    pts = mesh_ordered_points(n, rng).astype(np.float32)
    proj = np.stack(
        [(v.camera.k4 @ v.camera.rt)[:3, :] for v in big_views]
    )
    colors = np.stack([v.color for v in big_views])

    def time_pallas():
        s, _ = gather_colors_pallas(pts, proj, colors)
        t0 = time.perf_counter()
        s, _ = gather_colors_pallas(pts, proj, colors)
        return time.perf_counter() - t0, s

    def time_xla():
        colors_flat = jnp.asarray(colors.reshape(nv, h * w, 3))
        proj_j = jnp.asarray(proj.astype(np.float32))
        pts_j = jnp.asarray(pts)
        r, ok_ = _gather_chunk(pts_j, proj_j, colors_flat, h=h, w=w,
                               z_test=False)
        float(jnp.sum(r.astype(jnp.float32)))
        t0 = time.perf_counter()
        r, ok_ = _gather_chunk(pts_j, proj_j, colors_flat, h=h, w=w,
                               z_test=False)
        float(jnp.sum(r.astype(jnp.float32)))
        return time.perf_counter() - t0, np.asarray(r), np.asarray(ok_)

    tp, sp = time_pallas()
    tx, rx, okx = time_xla()
    samples = n * nv
    print(f"pallas gather: {samples / tp / 1e9:.2f} G samples/s "
          f"({tp*1e3:.1f} ms)", flush=True)
    print(f"xla gather:    {samples / tx / 1e9:.3f} G samples/s "
          f"({tx*1e3:.1f} ms)", flush=True)
    print(f"speedup: {tx / tp:.1f}x", flush=True)
    return 0 if ok else 1


if __name__ == "__main__":
    raise SystemExit(main())
