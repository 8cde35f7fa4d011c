"""CPU simulation of the rowsel kernel's static-pass coverage (no TPU).

Replays the bench geometry's per-subtile index math (same tables, same
orientation grouping, same anchors) in NumPy and reports the miss fraction
— the share of valid voxel-view pairs the n_k row-select passes do NOT
cover and the remainder walk must carry — for:

* the shipping full-row anchors (validates against the hardware-measured
  14.4% at k6/wc2, docs/KERNEL.md coverage sweep),
* voxel-LANE-chunked anchors: rmin per (row, chunk of C voxel lanes) —
  an upper bound on what chunking can give, but NOT implementable with
  one select dot (two voxel chunks may read the same image column at
  different rows, and a dot output holds one value per image column), and
* IMAGE-COLUMN-chunked anchors: anchor per (row, chunk of W image
  columns). This IS dot-implementable: stack the chunk-masked window
  blocks along the contraction axis ((n_ch*wr, 128), blocks zero outside
  their own columns) so ONE dot per plane serves a different image row
  per column chunk. Two anchor estimators are simulated:
  - min:  exact min of vi over voxels landing in the chunk (in-kernel
    cost: n_ch masked lane-min reductions — expensive, ~46 ms each);
  - mean: round(mean vi) - (k-1)//2 (in-kernel cost: two skinny MXU
    dots for masked sum and count — near-free, the planned estimator).

A pass serves one v-value per (row, chunk) instead of per row, so chunking
divides the per-row v-span a pass must cover. This script predicts the
miss fraction to decide whether the stacked-window chunked dot is worth
building (docs/KERNEL.md round-2.5: coverage is the only lever that moved).

Usage: python scripts/coverage_sim.py [dims=513] [n_views=32] [sample=400]
"""

import sys

sys.path.insert(0, ".")

import numpy as np

from cudadepthmapintegration_tpu.kernels.integrate_pallas import (
    group_views_by_orientation,
)
from cudadepthmapintegration_tpu.ops.integrate import projection_tables
from cudadepthmapintegration_tpu.testing import orbit_cameras, render_sphere_view
from cudadepthmapintegration_tpu.core import RayPotential, VoxelGrid


def round_half_away(x):
    return np.sign(x) * np.floor(np.abs(x) + 0.5)


def main():
    dims = int(sys.argv[1]) if len(sys.argv) > 1 else 513
    n_views = int(sys.argv[2]) if len(sys.argv) > 2 else 32
    sample = int(sys.argv[3]) if len(sys.argv) > 3 else 400
    h = w = 512
    sj, wr, n_wc = 64, 64, 2

    grid = VoxelGrid(
        dims=(dims,) * 3, origin=(-1.6,) * 3, spacing=(3.2 / (dims - 1),) * 3
    )
    cams = orbit_cameras(n_views, 4.0, focal=300.0, width=w, image_height=h)
    views = [render_sphere_view(c, w, h, radius=1.0, background=-1.0)
             for c in cams]
    tables = projection_tables(grid, views, np.float32)
    axis_tables = {0: tables.tx, 1: tables.ty, 2: tables.tz}
    rots = [(v.camera.rt @ grid.matrix)[:3, :3] for v in views]
    groups = group_views_by_orientation(rots)

    cz, cy, cx = grid.volume_shape
    rng = np.random.default_rng(0)

    ks = [2, 4, 6, 8]
    # (kind, param): full-row (shipping), voxel-lane chunks, image chunks.
    variants = [
        ("row", None),
        ("lane", 32),
        ("imgmin", 64), ("imgmean", 64),
        ("imgmin", 32), ("imgmean", 32),
        ("imgmean", 16),
    ]
    tot_valid = 0
    miss = {(v, k): 0 for v in variants for k in ks}
    # Asymmetric per-column-window pass counts (full-row anchors): window 1
    # (the higher u half) serves only ~20% of pairs (wc1-vs-wc2 sweep), so
    # fewer passes there trade a small miss increase for 3 fewer pass-units.
    asym_cfgs = [(6, 6), (6, 4), (6, 3), (6, 2), (8, 4), (7, 5), (8, 3)]
    amiss = {c: 0 for c in asym_cfgs}
    win1_share = 0

    for perm, idxs in sorted(groups.items()):
        k_ax, s_ax, l_ax = perm
        order = (2 - k_ax, 2 - s_ax, 2 - l_ax)
        dims_p = [(cz, cy, cx)[o] for o in order]
        czp, cyp, cxp = dims_p
        cyp_pad = cyp + (-cyp) % sj
        cxp_pad = cxp + (-cxp) % 128
        txs_all = axis_tables[l_ax][idxs]
        tys_all = axis_tables[s_ax][idxs]
        tzs_all = axis_tables[k_ax][idxs]
        tcs_all = tables.tc[idxs]
        n_sub = sample // len(groups)
        for _ in range(n_sub):
            vv = rng.integers(len(idxs))
            kk = rng.integers(czp)
            jt = rng.integers(cyp_pad // sj)
            it = rng.integers(cxp_pad // 128)
            tx = txs_all[vv]
            ty = tys_all[vv]
            tz = tzs_all[vv]
            tc = tcs_all[vv]
            ys = np.arange(jt * sj, (jt + 1) * sj)
            xs = np.arange(it * 128, (it + 1) * 128)
            yv = np.where(ys < cyp, ys, 0)
            xv = np.where(xs < cxp, xs, 0)
            in_grid = (ys < cyp)[:, None] & (xs < cxp)[None, :]
            h0 = ty[0, yv][:, None] + tx[0, xv][None, :] + tz[0, kk] + tc[0]
            h1 = ty[1, yv][:, None] + tx[1, xv][None, :] + tz[1, kk] + tc[1]
            h2 = ty[2, yv][:, None] + tx[2, xv][None, :] + tz[2, kk] + tc[2]
            u = round_half_away(h0 / h2)
            v = round_half_away(h1 / h2)
            valid = (
                in_grid & (h2 >= 0) & (u >= 0) & (v >= 0) & (u < w) & (v < h)
            )
            if not valid.any():
                continue
            ui = np.where(valid, u, 0).astype(np.int64)
            vi = np.where(valid, v, 0).astype(np.int64)
            big = 1 << 30
            vm = np.where(valid, vi, big)
            um = np.where(valid, ui, big)
            nv = int(valid.sum())
            tot_valid += nv
            u_lo = um.min()
            u0 = np.clip((u_lo // 128) * 128, 0, w - 128 * n_wc)
            in_u = (ui >= u0) & (ui < u0 + 128 * n_wc)
            rmin_row = np.broadcast_to(vm.min(axis=1, keepdims=True), vm.shape)
            v_lo = min(rmin_row.min(), big - 1)
            v0 = np.clip((v_lo // 8) * 8, 0, h - wr)
            vi_loc = vi - v0
            for var in variants:
                kind, prm = var
                for k in ks:
                    if kind == "row":
                        anch_full = rmin_row
                    elif kind == "lane":
                        # endpoint-min anchor per voxel-lane chunk (upper
                        # bound; not dot-implementable, see docstring).
                        left = vm[:, ::prm]
                        right = vm[:, prm - 1 :: prm]
                        anch_full = np.repeat(
                            np.minimum(left, right), prm, axis=1
                        )
                    else:
                        # image-column chunks of width prm within the
                        # n_wc*128-column window span.
                        n_ch = 128 * n_wc // prm
                        uch = np.clip((ui - u0) // prm, 0, n_ch - 1)
                        anch_full = np.full_like(vm, big)
                        for c in range(n_ch):
                            m = valid & in_u & (uch == c)
                            if not m.any():
                                continue
                            if kind == "imgmin":
                                a = np.where(m, vi, big).min(
                                    axis=1, keepdims=True
                                )
                                a = np.where(
                                    m.any(axis=1, keepdims=True), a, big
                                )
                            else:  # imgmean
                                cnt = m.sum(axis=1, keepdims=True)
                                s_ = np.where(m, vi, 0).sum(
                                    axis=1, keepdims=True
                                )
                                a = np.where(
                                    cnt > 0,
                                    np.round(
                                        s_ / np.maximum(cnt, 1)
                                    ).astype(np.int64)
                                    - (k - 1) // 2,
                                    big,
                                )
                            anch_full = np.where(m, a, anch_full)
                    covered = (
                        valid
                        & (vi >= anch_full)
                        & (vi_loc >= 0)
                        & (vi_loc < wr)
                        & (vi - anch_full < k)
                        & in_u
                    )
                    miss[(var, k)] += nv - int(covered.sum())
            in_win1 = in_u & (ui >= u0 + 128)
            win1_share += int((valid & in_win1).sum())
            base_cov = (
                valid & (vi >= rmin_row) & (vi_loc >= 0) & (vi_loc < wr)
            )
            span = vi - rmin_row
            for k0, k1 in asym_cfgs:
                cov = base_cov & np.where(in_win1, span < k1, span < k0) & in_u
                amiss[(k0, k1)] += nv - int(cov.sum())

    print(f"sampled {tot_valid/1e6:.1f} M valid voxel-view pairs "
          f"({dims-1}^3 x {n_views} views, sj{sj} wr{wr} wc{n_wc})")
    hdr = "anchors        " + "".join(f"  k{k:<6}" for k in ks)
    print(hdr)
    for var in variants:
        kind, prm = var
        name = "full-row" if kind == "row" else f"{kind}{prm}"
        row = f"{name:<15}"
        for k in ks:
            row += f"  {100.0 * miss[(var, k)] / tot_valid:5.1f}% "
        print(row)
    print(f"\nwindow-1 share of valid pairs: "
          f"{100.0 * win1_share / tot_valid:.1f}%")
    print("asymmetric (k_win0, k_win1) full-row miss "
          "(pass-units = k0 + k1):")
    for k0, k1 in asym_cfgs:
        print(f"  k{k0}/k{k1} ({k0 + k1:2d} units)  "
              f"{100.0 * amiss[(k0, k1)] / tot_valid:5.1f}%")


if __name__ == "__main__":
    main()
