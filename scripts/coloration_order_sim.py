"""CPU study: why the coloration kernel is flat at ~0.3 G samples/s.

Replays the TPU coloration bench's tiling and anchor math in NumPy for
the real MC sphere mesh and measures, per (tile, view):

* per-ROW projected v-span (the rowsel coverage obstacle),
* static-pass miss fraction at k in {4, 8, 12}, and
* the remainder-walk window count implied by the miss bbox — the
  k-invariant cost the hardware sweep exposed (50 ms at every k/wc/tb).

Compares vertex orders: mesh (welded raster), Morton, and Hilbert. A
Morton 128-run can straddle quadrant boundaries (discontiguous jumps),
spreading a lane row across the tile footprint; Hilbert runs are always
connected, so per-row spans should collapse to the pure patch size.

Usage: python scripts/coloration_order_sim.py [n_views=8]
"""

import sys

sys.path.insert(0, ".")
sys.path.insert(0, "scripts")

import numpy as np

from cudadepthmapintegration_tpu.kernels.coloration_pallas import (
    _morton_order,
)
from cudadepthmapintegration_tpu.testing import sphere_scene
from tpu_coloration_bench import sphere_mc_mesh


def _hilbert_d3(points: np.ndarray, bits: int = 10) -> np.ndarray:
    """Permutation sorting points by 3-D Hilbert index (Skilling's
    transform: Gray-code walk with per-axis bit exchanges)."""
    lo = points.min(axis=0)
    span = np.maximum(points.max(axis=0) - lo, 1e-12)
    x = np.minimum(
        ((points - lo) / span * (1 << bits)).astype(np.uint64),
        (1 << bits) - 1,
    )  # (n, 3)
    x = x.T.copy()  # (3, n) axis-major, mutated in place
    n = np.uint64(1) << np.uint64(bits - 1)
    # Inverse undo excess work (Skilling 2004, transposed form).
    q = n
    while q > 1:
        p = q - np.uint64(1)
        for i in range(3):
            flip = (x[i] & q) != 0
            x[0] = np.where(flip, x[0] ^ p, x[0])  # invert low bits of x0
            t = (x[0] ^ x[i]) & p
            t = np.where(flip, np.uint64(0), t)
            x[0] ^= t
            x[i] ^= t
        q >>= np.uint64(1)
    # Gray encode
    for i in range(1, 3):
        x[i] ^= x[i - 1]
    t = np.zeros_like(x[0])
    q = n
    while q > 1:
        t = np.where((x[2] & q) != 0, t ^ (q - np.uint64(1)), t)
        q >>= np.uint64(1)
    for i in range(3):
        x[i] ^= t
    # Interleave transposed bits into one key (x0 bit is most significant).
    key = np.zeros(x.shape[1], np.uint64)
    for b in range(bits - 1, -1, -1):
        for i in range(3):
            key = (key << np.uint64(1)) | ((x[i] >> np.uint64(b)) & np.uint64(1))
    return np.argsort(key, kind="stable")


def round_half_away(v):
    return np.sign(v) * np.floor(np.abs(v) + 0.5)


def study(points, views, sj=32, wr=64, n_wc=2, label=""):
    tile = sj * 128
    n = len(points)
    nt = n // tile  # drop the ragged tail for the study
    pts = points[: nt * tile].reshape(nt, sj, 128, 3)
    ks = (2, 4, 8, 12)
    miss = {k: 0 for k in ks}
    tot = 0
    spans = []
    walk_windows = {k: 0 for k in ks}
    h, w = views[0].depth.shape
    big = 1 << 30
    for view in views:
        proj = (view.camera.k4 @ view.camera.rt)[:3, :]
        for t in range(nt):
            p = pts[t]  # (sj, 128, 3)
            hom = p @ proj[:, :3].T + proj[:, 3]
            u = round_half_away(hom[..., 0] / hom[..., 2])
            v = round_half_away(hom[..., 1] / hom[..., 2])
            valid = (u >= 0) & (v >= 0) & (u < w) & (v < h)
            if not valid.any():
                continue
            vi = np.where(valid, v, big).astype(np.int64)
            ui = np.where(valid, u, big).astype(np.int64)
            tot += int(valid.sum())
            rmin = vi.min(axis=1, keepdims=True)
            vspan = np.where(
                valid.any(axis=1),
                np.where(valid, v, -1).max(axis=1)
                - np.where(rmin < big, rmin[:, 0], 0),
                0,
            )
            spans.extend(vspan[valid.any(axis=1)].tolist())
            v_lo = rmin.min()
            v0 = np.clip((v_lo // 8) * 8, 0, h - wr)
            u_lo = ui.min()
            u0 = np.clip((u_lo // 128) * 128, 0, w - 128 * n_wc)
            vi_loc = np.where(valid, v, 0).astype(np.int64) - v0
            in_u = (
                valid
                & (ui >= u0)
                & (ui < u0 + 128 * n_wc)
            )
            for k in ks:
                cov = (
                    valid
                    & (vi_loc >= 0)
                    & (vi_loc < wr)
                    & ((np.where(valid, v, 0) - rmin) < k)
                    & (vi >= rmin)
                    & in_u
                )
                rem = valid & ~cov
                miss[k] += int(rem.sum())
                if rem.any():
                    rv = np.where(rem, v, np.nan)
                    ru = np.where(rem, u, np.nan)
                    nr = (np.nanmax(rv) - np.nanmin(rv)) // 8 + 1
                    nc = (np.nanmax(ru) - np.nanmin(ru)) // 128 + 1
                    walk_windows[k] += int(nr * nc)
    spans = np.asarray(spans)
    print(f"[{label}] valid pairs {tot/1e6:.1f} M; per-row v-span "
          f"p50={np.percentile(spans, 50):.0f} p90="
          f"{np.percentile(spans, 90):.0f} p99="
          f"{np.percentile(spans, 99):.0f}")
    n_units = nt * len(views)
    for k in ks:
        print(f"  k{k:<3} miss {100*miss[k]/tot:5.1f}%   "
              f"walk windows/unit {walk_windows[k]/n_units:6.2f}")


def main():
    n_views = int(sys.argv[1]) if len(sys.argv) > 1 else 8
    views = sphere_scene(n_views=n_views, width=512, height=512,
                         focal=300.0)
    mesh_pts = sphere_mc_mesh().astype(np.float64)
    print(f"mesh verts: {len(mesh_pts)}, views: {n_views} x 512^2")
    study(mesh_pts, views, label="mesh order")
    study(mesh_pts[_morton_order(mesh_pts)], views, label="morton")
    study(mesh_pts[_hilbert_d3(mesh_pts)], views, label="hilbert")


if __name__ == "__main__":
    main()
