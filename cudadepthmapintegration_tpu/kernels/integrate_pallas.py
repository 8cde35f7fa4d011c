"""Pallas TPU kernel for TSDF depth-map integration.

Why a kernel at all: the integrate op is gather-bound — each voxel reads
``depth[round(v), round(u)]`` at a data-dependent pixel. XLA's TPU gather
lowers to a serialized loop (~0.1 G elem/s measured on v5e); Mosaic's
``tpu.dynamic_gather`` (same-shape 2-D ``take_along_axis``) runs >10 G elem/s.
This kernel restructures the reference CUDA hot loop
(``Reconstruction/CudaReconstruction.cu:158-212``) around that primitive.

Design (TPU-first, not a CUDA translation):

* **Grid** ``(cz, V)`` — z-slice outer, view inner. The volume z-slab block
  stays resident in VMEM across all V views (output-accumulation pattern), so
  volume HBM traffic is 8 bytes/voxel per whole *view sweep*, not per view —
  the loop-nest inversion called out in SURVEY.md section 7.4.
* **Projection math is separable** (see ``ops/integrate.py``): per-axis
  tables combined with broadcasted VPU adds; no per-voxel mat4 products.
* **Branchless exact gather.** Per (8, 128) voxel subtile the projected
  pixel footprint is measured with four vector reductions, then covered by a
  *statically unrolled* ``n_wr x n_wc`` grid of aligned (8, 128) windows
  anchored at the footprint minimum, plus an L-shaped remainder (rows below
  the grid, columns right of it) walked by while-loops that execute ZERO
  iterations when the footprint fits. Measured on v5e: per-subtile
  `lax.cond` tiering serializes the kernel (~2x slower), and while-walking
  every window costs ~3x the gathers — hence static-unroll + empty-loop
  remainders. Every window row is lane-gathered (``dynamic_gather``) and
  combined by row-match select — exact for arbitrary geometry. (8 gathers
  per (8, 128) window is optimal for a per-lane gather unit.)
* **Orientation grouping** (wrapper): a subtile's image-v span is
  ``~128*|dv/d(lane axis)|``, which explodes when the lane axis parallels the
  camera's viewing direction. :func:`integrate_views_oriented` groups views
  by the volume-axis permutation that aligns lanes with the image-u
  direction and transposes the volume per group (one HBM round trip,
  amortized over the group's views).

Parity: identical piecewise ray potential, half-away-from-zero rounding,
``hom.z < 0`` rejection, bounds tests, and the -1 invalid-depth sentinel.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

__all__ = [
    "OrientedFusionPlan",
    "pallas_integrate",
    "integrate_views_oriented",
    "split_depth_planes",
    "pad_volume",
    "unpad_volume",
    "best_axis_permutation",
    "group_views_by_orientation",
]

# Set True (before first use) to run kernels in the Pallas interpreter
# (CPU testing without TPU hardware).
INTERPRET = False

# Matmul precision of the one-hot row-select dot (see _rowsel_pass).
# HIGHEST (6-pass / 3-way-split bf16) is what makes the select exact for
# full 24-bit fp32 depth values; lower settings are for perf probes ONLY
# (they truncate the selected depth mantissa). Read at trace time.
ROWSEL_PRECISION = jax.lax.Precision.HIGHEST

# Volume y-block height for the dynamic 2-band modes (probe knob).
DYN_CY_B = 64

# Volume y-block height cap for the WINDOWED band-sweep modes
# ('rowselw'/'rowsel3w'): shorter y-blocks project tighter row spans, so
# the static per-unit band window (n_bwin = max units' span) COULD shrink
# — but measured (2026-08-20, tpu_band_probe win): the windows did NOT
# tighten with shorter blocks on the probe rigs (the span is z-slice- and
# view-dominated there) while the extra band re-fetches cost 5-25%, so
# the default is now effectively unclamped (= the standard 2 MiB y-block).
# Probe knob (scripts/tpu_band_probe.py sweeps it).
HBW_CY_B = 1 << 20

# Band-height cap for the HBM band-sweep modes (see _hbm_band_rows):
# taller bands = fewer band sweeps (less re-projection) but more VMEM.
# Measured (scripts/tpu_band_probe.py cap/cap2, 256^3 x 8): monotone in
# favor of taller bands at EVERY size the budget admits — the r3 sweep
# stopped at 256; cap2 (2026-08-20) showed 640x480 rowsel3h 1.30 -> 1.48 G
# (one 512-row band = whole padded map, beating even the VMEM whole-map
# mode's 1.34), 1024x768 rowselh 0.79 -> 0.91 G (one 1024-row band),
# 1920x1080 flat at 0.37 (budget clamps bv to 512 = 3 bands). The
# DEPTH_VMEM_BUDGET halving loop is the real limiter, so the cap is now
# just a generous ceiling. Checksums are bit-identical at any cap.
HBM_BAND_CAP = 1024

# Cap on the double-buffered (vb, [3,] hp, wp) depth block: view_block is
# clamped so 2x the block stays under this many bytes of the ~16 MiB
# scoped-VMEM budget (the volume block, tables, and kernel temporaries
# share the rest). Module global so perf probes can sweep it.
DEPTH_VMEM_BUDGET = 8 << 20


# Hard VMEM ceiling on the double-buffered whole-map depth block. Measured
# on v5e (scripts/tpu_mapsize_probe.py, 2026-08-18): 800x600 split planes
# (12.9 MiB double-buffered) compile and run; 1024x768 (18.9 MiB) fails in
# the Mosaic allocator (opaque remote-compile 500). Checked host-side so
# oversized maps get an actionable error instead.
DEPTH_VMEM_CEILING = 14 << 20


def _check_depth_vmem(h, w, hp, wp, split3):
    planes = 3 if split3 else 1
    need = 2 * planes * hp * wp * 4  # double-buffered fp32 block
    if need > DEPTH_VMEM_CEILING:
        raise ValueError(
            f"depth maps of {h}x{w} need {need / (1 << 20):.1f} MiB of "
            f"double-buffered VMEM (limit ~{DEPTH_VMEM_CEILING >> 20} MiB "
            f"on v5e): the Pallas kernel stages whole maps in VMEM "
            f"(measured ceiling: 800x600 fits, 1024x768 does not — "
            f"docs/KERNEL.md). Use the XLA backend (backend='xla'), "
            f"downscale the maps, or use mode='rowsel' (1 plane instead "
            f"of 3) for sizes up to ~3x larger."
        )


def _vmem_safe_mode(mode, h, w, window_rows):
    """Route oversized depth maps off the whole-map VMEM staging path
    (bit-identical results in every branch — mode changes only affect
    select-dot plumbing / window residency, never values):

    * 'rowsel3' whose 3 split planes blow the VMEM ceiling but whose
      single plane fits -> 'rowsel' (1 plane, HIGHEST-precision selects;
      measured 0.82 G upd/s at 1024x768, docs/KERNEL.md);
    * anything whose single plane ALSO blows the ceiling -> the matching
      HBM-resident mode ('rowselh'/'rowsel3h'): depth planes stay in HBM
      and the kernel DMAs per-footprint windows — NO size ceiling (the
      round-2 hard error for >14 MiB maps is gone);
    * the miss-tracking diagnostics keep the hard error (a diagnostic
      silently switching residency would invalidate what it measures).
    """
    rowsel_family = (
        "rowsel", "rowsel3", "rowselm", "rowsel3m", "rowselh", "rowsel3h"
    )
    if mode in ("rowselh", "rowsel3h", "rowseld", "rowsel3d",
                "rowselw", "rowsel3w"):
        return mode  # HBM-resident band modes: no VMEM ceiling
    min_h = int(window_rows) if mode in rowsel_family else 8
    hp = h + max(min_h - h, (-h) % 8)
    wp = w + ((-w) % 128)
    split3 = mode in ("rowsel3", "rowsel3m")
    import logging

    log = logging.getLogger(__name__)
    one_plane_over = 2 * hp * wp * 4 > DEPTH_VMEM_CEILING
    if split3 and 2 * 3 * hp * wp * 4 > DEPTH_VMEM_CEILING:
        if one_plane_over:
            if mode == "rowsel3m":
                # Diagnostics never switch residency silently.
                _check_depth_vmem(h, w, hp, wp, split3=True)
            # Very wide maps squeeze the 3-plane band height below the
            # single-plane one; FEWER BANDS win (measured at 1920x1080:
            # rowselh 3 bands 0.37 G vs rowsel3h 9 bands 0.32 G) — but on
            # equal band count the 3-plane DEFAULT-precision selects win
            # (640x480 one-band: rowsel3h 1.48 vs rowselh 1.37, cap2
            # probe). Compare counts, prefer 3-plane on ties
            # (bit-identical either way; rowsel's HIGHEST-precision
            # selects are exact).
            nb3 = -(-h // _hbm_band_rows(wp, True, 64))
            nb1 = -(-h // _hbm_band_rows(wp, False, 64))
            target = "rowsel3h" if nb3 <= nb1 else "rowselh"
            log.warning(
                "depth maps %dx%d exceed even the single-plane VMEM "
                "ceiling; using HBM-resident mode=%r "
                "(bit-identical; see docs/KERNEL.md)", h, w, target,
            )
            return target
        downgraded = "rowsel" if mode == "rowsel3" else "rowselm"
        log.warning(
            "depth maps %dx%d exceed the 3-plane VMEM ceiling; using "
            "single-plane mode=%r (bit-identical, HIGHEST-precision "
            "selects; see docs/KERNEL.md)", h, w, downgraded,
        )
        return downgraded
    if mode == "rowselm" and one_plane_over:
        _check_depth_vmem(h, w, hp, wp, split3=False)
    if mode == "rowsel" and one_plane_over:
        log.warning(
            "depth maps %dx%d exceed the single-plane VMEM ceiling; using "
            "HBM-resident mode='rowselh' (bit-identical; docs/KERNEL.md)",
            h, w,
        )
        return "rowselh"
    _check_depth_vmem(h, w, hp, wp, split3)
    return mode


def _fast_groups_viable(mode, h, w, window_rows) -> bool:
    """fast_groups routes through the tracked twin ('rowselm'/'rowsel3m'),
    which keeps the whole-map VMEM residency requirement (diagnostics never
    switch residency silently — _vmem_safe_mode raises for them instead).
    Fast routing is therefore only viable when the exact mode itself needs
    no downgrade/HBM re-route; otherwise OrientedFusionPlan.run skips the
    fast path and the inline runner re-routes safely."""
    return _vmem_safe_mode(mode, h, w, window_rows) == mode


def _round_half_away(x):
    return jnp.sign(x) * jnp.floor(jnp.abs(x) + 0.5)


def _window_pass(planes, rs, cs, ui, vi, sel, ds_):
    """Gather one aligned (8, 128) image window into an (SJ, 128) voxel
    subtile: 8 lane-gathers + row selects (per plane; the row-match masks
    are shared across planes)."""
    wins = [p[pl.ds(rs, 8), pl.ds(cs, 128)] for p in planes]
    u_loc = jnp.clip(ui - cs, 0, 127)
    in_cols = (ui >= cs) & (ui < cs + 128)
    sel_c = sel & in_cols
    for rr in range(8):
        match = sel_c & (vi == rs + rr)
        ds_ = tuple(
            jnp.where(
                match,
                jnp.take_along_axis(
                    jnp.broadcast_to(win[rr][None, :], sel.shape), u_loc, axis=1
                ),
                d,
            )
            for win, d in zip(wins, ds_)
        )
    return ds_


def _rowsel_pass(wins, t, vi_loc, u_loc, sel_c, ds_, wr, precisions=None):
    """One row-select pass: pick image row ``t[s]`` (per voxel row, constant
    along lanes) out of each (wr, 128) window plane with a 0/1-matrix MXU
    matmul, then lane-gather columns — 1 dot + 1 gather per plane instead
    of 8 gathers + 8 selects for the whole window. The one-hot selector and
    the match mask are computed once and shared across planes.

    Exactness: the selector is exactly 0.0/1.0 and a 1.0 factor splits as
    (1.0, 0, ...) in every bf16 multi-pass scheme, so the selected value
    reproduces the source exactly as long as the source's mantissa survives
    the scheme's value-side split. MEASURED on this chip (round 2.5):
    HIGHEST selection of full 24-bit fp32 depth planes is bit-identical to
    the provably-exact rowsel3 split-plane path, and its timing matches a
    6-pass (3-way-split) lowering. A round-2 experiment nevertheless saw
    corrupted low bits selecting 24-bit PACKED-INTEGER planes
    (r*65536+g*256+b) at HIGHEST — unresolved; stay conservative with
    packed integers (keep planes < 2^16). bf16-VALUED planes (<= 8
    significant bits: uint8 color channels, :func:`split_depth_planes`
    output) may pass per-plane ``precisions=[Precision.DEFAULT, ...]`` —
    a single exact MXU pass each. Out-of-range t rows produce an all-zero
    selector and a False match."""
    sj = vi_loc.shape[0]
    iota_r = jax.lax.broadcasted_iota(jnp.int32, (sj, wr), 1)
    p = (iota_r == t).astype(jnp.float32)  # (sj, wr) one-hot (or zero) rows
    match = sel_c & (vi_loc == t) & (t < wr) & (t >= 0)
    if precisions is None:
        precisions = (ROWSEL_PRECISION,) * len(wins)
    out = []
    for win, d, prec in zip(wins, ds_, precisions):
        a = jax.lax.dot_general(
            p, win, (((1,), (0,)), ((), ())),
            precision=prec,
            preferred_element_type=jnp.float32,
        )  # (sj, 128)
        g = jnp.take_along_axis(a, u_loc, axis=1)
        out.append(jnp.where(match, g, d))
    return tuple(out), match


def _rowsel_pass_sum(wins, t, vi_loc, u_loc, sel_c, d, wr):
    """:func:`_rowsel_pass` over the 3 SPLIT PLANES of one logical image
    (see :func:`split_depth_planes`): each plane is bf16-valued, so a
    DEFAULT-precision dot (one MXU pass; the fp32->bf16 operand conversion
    is lossless here) selects it exactly, and the fp32 sum of the three
    selected plane values reconstructs the original 24-bit depth exactly
    (non-overlapping mantissa segments add without rounding in any order).
    Net: 3 MXU passes instead of HIGHEST's 6-pass scheme, same bits."""
    sj = vi_loc.shape[0]
    iota_r = jax.lax.broadcasted_iota(jnp.int32, (sj, wr), 1)
    p = (iota_r == t).astype(jnp.float32)
    match = sel_c & (vi_loc == t) & (t < wr) & (t >= 0)
    a = None
    for win in wins:
        ai = jax.lax.dot_general(
            p, win, (((1,), (0,)), ((), ())),
            precision=jax.lax.Precision.DEFAULT,
            preferred_element_type=jnp.float32,
        )
        a = ai if a is None else a + ai
    g = jnp.take_along_axis(a, u_loc, axis=1)
    return jnp.where(match, g, d), match


def _window_pass1(depth, rs, cs, ui, vi, sel, d):
    """Single-plane wrapper over :func:`_window_pass` (windows-mode path)."""
    return _window_pass((depth,), rs, cs, ui, vi, sel, (d,))[0]


def _window_pass_sum(planes, rs, cs, ui, vi, sel, d):
    """Remainder-walk window pass over split planes: reconstruct the fp32
    window once (two exact adds), then run the single-plane row loop."""
    win = None
    for p in planes:
        w = p[pl.ds(rs, 8), pl.ds(cs, 128)]
        win = w if win is None else win + w
    u_loc = jnp.clip(ui - cs, 0, 127)
    in_cols = (ui >= cs) & (ui < cs + 128)
    sel_c = sel & in_cols
    for rr in range(8):
        match = sel_c & (vi == rs + rr)
        d = jnp.where(
            match,
            jnp.take_along_axis(
                jnp.broadcast_to(win[rr][None, :], sel.shape), u_loc, axis=1
            ),
            d,
        )
    return d


def _gather_pixels_multi(
    planes, ui, vi, valid, *, hp, wp, wr, n_wc, n_k, sum_planes=False,
    fallback=True, precisions=None, anchors="exact",
):
    """Exact per-element image gather ``plane[vi, ui]`` over one or more
    same-shape (hp, wp) VMEM ref planes at SHARED indices — the index
    reductions, one-hot selectors, and remainder walks are computed once.

    ui/vi int32 (sj, 128) with invalid elements pointing at (0, 0); returns
    a tuple of (sj, 128) f32 with unspecified values where ~valid. Static
    coverage: an aligned (wr, 128*n_wc) window anchored at the footprint
    minimum, n_k row-select passes per column window; everything uncovered
    falls to a zero-iteration while-walk over the uncovered bbox.

    sum_planes=True: `planes` are the 3 exact split planes of ONE logical
    image (:func:`split_depth_planes`); the select dots run at DEFAULT
    precision per plane and the plane sums reconstruct the fp32 value
    exactly — returns a 1-tuple. (rowsel3 fast path, half the MXU work of
    the HIGHEST-precision single-plane dot.)

    fallback=False: SKIP the in-kernel remainder machinery and return
    ``(ds_, covered)`` instead, where ``covered`` is the closed-form
    predicate of which voxels the static passes gathered exactly:
    the static-pass matches are ``vi_loc == rmin + k`` with
    ``rmin + k`` in [0, wr), unioned over k < n_k and over the n_wc
    column windows, i.e. exactly
    ``valid & vi_loc in [0, wr) & (vi - rowmin) < n_k & ui in
    [u0, u0 + 128*n_wc)``. Measured on v5e (512^3 x 32): the remainder
    machinery — 4 bbox reductions + two nested zero-iteration while
    walks — was 72% of kernel time; callers that can re-dispatch an
    exact pass on miss (see ``mode='rowsel3m'``) skip all of it."""
    big = jnp.int32(1 << 30)
    # Per-row image-v minimum does double duty: its column-min is the
    # subtile v_lo (saves a second full reduction) and, rebased by v0, it
    # is the row-select base. Rows whose minimum lands beyond the window
    # yield t >= wr -> zero selector -> remainder walk (same semantics as
    # an in-window-filtered min, since min(row) < wr whenever any element
    # is in-window).
    if anchors == "endpoint":
        # Under orientation grouping, u and v are fractional-linear (hence
        # monotone) along the lane axis wherever the whole row is valid, so
        # the row minima sit at lane 0 or 127 — two static lane slices
        # replace the 128-lane masked reductions. Rows with an invalid
        # endpoint get a `big` anchor: their passes match nothing and the
        # voxels fall to the EXACT remainder walk (anchors affect speed,
        # never values; the coverage predicate below guards vi >= rowmin).
        vm = jnp.where(valid, vi, big)
        um = jnp.where(valid, ui, big)
        rowmin = jnp.minimum(vm[:, :1], vm[:, 127:128])
        u_lo = jnp.min(jnp.minimum(um[:, :1], um[:, 127:128]))
    else:
        rowmin = jnp.min(jnp.where(valid, vi, big), axis=1, keepdims=True)
        u_lo = jnp.min(jnp.where(valid, ui, big))
    v_lo = jnp.min(rowmin)
    v0 = jnp.clip((v_lo // 8) * 8, 0, hp - wr)
    u0 = jnp.clip((u_lo // 128) * 128, 0, wp - 128 * n_wc)
    vi_loc = vi - v0  # >= 0 for valid voxels (v0 <= v_lo)
    rmin = rowmin - v0

    n_out = 1 if sum_planes else len(planes)
    ds_ = tuple(jnp.zeros(valid.shape, jnp.float32) for _ in range(n_out))
    for c in range(n_wc):
        cs = pl.multiple_of(u0 + 128 * c, 128)
        wins = [
            p[pl.ds(pl.multiple_of(v0, 8), wr), pl.ds(cs, 128)]
            for p in planes
        ]
        u_loc = jnp.clip(ui - cs, 0, 127)
        sel_c = valid & (ui >= cs) & (ui < cs + 128)
        for k in range(n_k):
            if sum_planes:
                d0, _ = _rowsel_pass_sum(
                    wins, rmin + k, vi_loc, u_loc, sel_c, ds_[0], wr
                )
                ds_ = (d0,)
            else:
                ds_, _ = _rowsel_pass(
                    wins, rmin + k, vi_loc, u_loc, sel_c, ds_, wr,
                    precisions=precisions,
                )

    # Closed-form coverage: a voxel matched pass k iff vi_loc == rmin + k
    # with that row in [0, wr), so the union over k < n_k and over the
    # n_wc column windows is this predicate — no per-pass bookkeeping.
    # (vi >= rowmin is automatic for exact anchors; endpoint anchors can
    # overshoot a row's true minimum, so it must be tested.)
    covered = (
        valid
        & (vi >= rowmin)
        & (vi_loc >= 0)
        & (vi_loc < wr)
        & (vi - rowmin < n_k)
        & (ui >= u0)
        & (ui < u0 + 128 * n_wc)
    )
    if not fallback:
        return ds_, covered

    # Exact remainder: walk (8, 128) windows over the bbox of voxels the
    # static passes did not cover; zero while-loop iterations when covered.
    # Measured (v5e, 512^3 x 32, k6): replacing the four rem-bbox
    # reductions with two + conservative footprint-derived bounds REGRESSES
    # 876 -> 1034 ms — with ~14% of pairs missing, walk-bbox TIGHTNESS
    # (only the uncovered band, only its u-range) is worth far more than
    # two ~46 ms reductions. Keep all four. NOTE: guarding them behind a
    # lax.cond hangs the Mosaic remote compile on this rig's toolchain
    # (like the sj128 shapes), so they run unconditionally.
    rem = valid & ~covered
    rv_lo = jnp.min(jnp.where(rem, vi, big))
    rv_hi = jnp.max(jnp.where(rem, vi, -1))
    ru_lo = jnp.min(jnp.where(rem, ui, big))
    ru_hi = jnp.max(jnp.where(rem, ui, -1))
    rv0 = jnp.clip((rv_lo // 8) * 8, 0, hp - 8)
    ru0 = jnp.clip((ru_lo // 128) * 128, 0, wp - 128)

    def row_cond(c_):
        return c_[0] <= rv_hi

    def row_body(c_):
        rs, acc = c_

        def col_cond(cc):
            return cc[0] <= ru_hi

        def col_body(cc):
            cs_, cacc = cc
            if sum_planes:
                cacc = (_window_pass_sum(
                    planes,
                    pl.multiple_of(rs, 8),
                    pl.multiple_of(cs_, 128),
                    ui, vi, rem, cacc[0],
                ),)
            else:
                cacc = _window_pass(
                    planes,
                    pl.multiple_of(rs, 8),
                    pl.multiple_of(cs_, 128),
                    ui, vi, rem, cacc,
                )
            return cs_ + 128, cacc

        _, acc = jax.lax.while_loop(col_cond, col_body, (ru0, acc))
        return rs + 8, acc

    _, ds_ = jax.lax.while_loop(row_cond, row_body, (rv0, ds_))
    return ds_


def _volume_y_block(cy: int, cx: int, sj: int) -> int:
    """y-rows per volume block: split the (cy, cx) slab along y when a full
    block (x2 in/out, x2 double-buffered) would overflow VMEM; cap one
    block at ~2 MiB. Must stay a divisor of cy and a multiple of sj.
    Factored out so host-side window planning (_window_band_bounds_host)
    reproduces exactly the blocking the jitted impl will use."""
    cy_b = cy
    while cy_b > sj and cy_b * cx * 4 > (2 << 20):
        cy_b //= 2
    cy_b = max(sj, (cy_b // sj) * sj)
    while cy % cy_b:
        cy_b -= sj  # cy is a multiple of sj; find a divisor multiple of sj
    return cy_b


def _hbw_y_block(cy: int, cx: int, sj: int) -> int:
    """y-block height for the windowed band-sweep modes: the standard
    block clamped to HBW_CY_B (tighter blocks -> tighter band windows)."""
    cy_b = max(sj, (min(_volume_y_block(cy, cx, sj), HBW_CY_B) // sj) * sj)
    while cy % cy_b:
        cy_b -= sj
    return cy_b


def _hbm_band_rows(wp: int, split3: bool, wr: int) -> int:
    """Band height for the HBM-resident depth modes (full-width bands).

    The band-sweep design stages the depth map as FULL-WIDTH horizontal
    bands of ``bv`` rows — a regular Blocked BlockSpec whose index is a
    GRID axis, i.e. placement is program_id-pure. That constraint is the
    bisection result (scripts/tpu_hbm_repro.py, docs/KERNEL.md): this
    toolchain's Mosaic crashes on manual-DMA offsets derived from ANY
    memory load (vector reductions v11, SMEM input loads v13/v16,
    scalar-prefetch refs v17) and on Element-dim pipelined windows
    (v18/v19) — band-sweep uses none of those.

    ``bv`` starts at ``HBM_BAND_CAP`` (>= the select-window height) and
    shrinks by halves until the double-buffered (3, bv, wp) band block
    fits the depth VMEM budget — so arbitrarily wide maps (HD, 4K)
    always fit, and taller bands mean fewer sweeps (the per-band
    projection re-run is the mode's main tax).
    """
    bv = max(8, (max(min(wr, 64), HBM_BAND_CAP) // 8) * 8)
    planes = 3 if split3 else 1
    while bv > 8 and 2 * planes * bv * wp * 4 > DEPTH_VMEM_BUDGET:
        bv //= 2
    return bv


def _dyn_band_rows(wp: int, split3: bool) -> int:
    """Band height for the DYNAMIC 2-band modes: two band blocks are
    double-buffered by the pipeline, so the budget covers 4 copies."""
    bv = 256
    planes = 3 if split3 else 1
    while bv > 8 and 4 * planes * bv * wp * 4 > DEPTH_VMEM_BUDGET:
        bv //= 2
    return bv


def _dyn_band_anchors(tx, ty_vc, tz_kv, tc, *, cy_b, bv, hp):
    """Per-(z, y-block, view) band index for the dynamic 2-band modes
    (jit-traced; shapes static). v is fractional-linear over the block's
    (y, x) rectangle and h2 affine, so when h2 > 0 at all 4 corners the
    corner v-minimum bounds the interior; a 2 px fp-drift margin and the
    floor-to-band give a conservative FIRST band — the block's rows are
    then expected inside bands [b, b+2). Pole blocks (mixed-sign corner
    h2) and poisoned padding fall back to band 0: the kernel's miss
    counter catches any pair the two bands do not serve and the caller
    re-dispatches the exact band-sweep mode (results stay exact in every
    branch). Returns int32 (cz, n_jtb, V), values in [0, hp//bv - 2]."""
    nv, _, _cx = tx.shape
    cy = ty_vc.shape[1]
    njt = cy // cy_b
    big = jnp.float32(1e8)
    ny_real = jnp.sum((ty_vc[0, :, 2] > -big).astype(jnp.int32))
    nx_real = jnp.sum((tx[0, 2, :] > -big).astype(jnp.int32))
    y_lo = jnp.arange(njt, dtype=jnp.int32) * cy_b
    y_hi = jnp.minimum(y_lo + (cy_b - 1), jnp.maximum(ny_real - 1, 0))
    ys = jnp.stack([y_lo, y_hi], -1)  # (njt, 2)
    xs = jnp.stack(
        [jnp.zeros((), jnp.int32), jnp.maximum(nx_real - 1, 0)]
    )  # (2,)
    tyc = jnp.take(ty_vc, ys.reshape(-1), axis=1).reshape(
        nv, njt, 2, 4
    ).transpose(0, 3, 1, 2)  # (V, 4, njt, 2)
    txc = jnp.take(tx, xs, axis=2)  # (V, 4, 2)
    zc = tz_kv + tc[None]  # (cz, V, 4)

    def hom(r):
        return (
            zc[:, :, r][:, :, None, None, None]
            + tyc[:, r][None, :, :, :, None]
            + txc[:, r][None, :, None, None, :]
        )  # (cz, V, njt, 2, 2)

    h1, h2 = hom(1), hom(2)
    pos = jnp.all(h2 > 0, axis=(3, 4))
    v = h1 / jnp.where(h2 > 0, h2, 1.0)
    vmin = jnp.min(v, axis=(3, 4))
    band = jnp.floor(vmin - 2.0).astype(jnp.int32) // bv
    band = jnp.where(pos, jnp.clip(band, 0, hp // bv - 2), 0)
    return jnp.transpose(band, (0, 2, 1))  # (cz, njt, V)


def _window_band_bounds_host(tx, ty_vc, tz_kv, tc, *, cy_b, bv, hp, h):
    """Host-side per-(z-slice, y-block, view) band WINDOWS for the
    windowed band-sweep modes ('rowselw'/'rowsel3w').

    Same corner-bound machinery as :func:`_dyn_band_anchors` (v is
    fractional-linear over a block's (y, x) rectangle, so with h2 > 0 at
    all 4 corners BOTH extrema sit at corners — v is monotone along every
    axis-aligned line when the denominator keeps one sign), run in fp64
    on the host at plan/staging time, and extended to the MAX as well:
    the window [lo_band, hi_band] covers every valid pair of the unit
    with a 2 px fp-drift margin. Blocks where the bound does not apply
    (mixed-sign corner h2 — cameras inside the grid) get the FULL map as
    their window. ``n_bwin`` (the static per-unit trip count of the band
    grid axis) is the max window length over all units, so inside-out
    rigs degrade to the plain band sweep rather than losing exactness;
    the kernel additionally counts out-of-window pairs so the caller can
    re-dispatch the exact sweep if any bound is ever violated.

    Inputs are in KERNEL layout: tx (V, 4, cx), ty_vc (V, cy, 4),
    tz_kv (cz, V, 4), tc (V, 4). Returns (anchors int32 (cz, n_jtb, V),
    n_bwin int). Reference anchor: the whole-map residency assumption at
    ``Reconstruction/CudaReconstruction.cu:302-331`` — here the map lives
    in HBM and only the rows a unit can touch are ever staged.
    """
    tx = np.asarray(tx, np.float64)
    ty = np.asarray(ty_vc, np.float64)
    tz = np.asarray(tz_kv, np.float64)
    tc = np.asarray(tc, np.float64)
    nv, cy, _ = ty.shape
    njt = cy // cy_b
    big = 1e8
    ny_real = int((ty[0, :, 2] > -big).sum())
    nx_real = int((tx[0, 2, :] > -big).sum())
    n_bands = hp // bv
    hi_cap = (h - 1) // bv  # valid pairs have v < h
    y_lo = np.arange(njt, dtype=np.int64) * cy_b
    y_hi = np.minimum(y_lo + (cy_b - 1), max(ny_real - 1, 0))
    ys = np.stack([y_lo, y_hi], -1)  # (njt, 2)
    xs = np.array([0, max(nx_real - 1, 0)])
    tyc = ty[:, ys.reshape(-1), :].reshape(nv, njt, 2, 4).transpose(
        0, 3, 1, 2
    )  # (V, 4, njt, 2)
    txc = tx[:, :, xs]  # (V, 4, 2)
    zc = tz + tc[None]  # (cz, V, 4)

    def hom(r):
        return (
            zc[:, :, r][:, :, None, None, None]
            + tyc[:, r][None, :, :, :, None]
            + txc[:, r][None, :, None, None, :]
        )  # (cz, V, njt, 2, 2)

    h1, h2 = hom(1), hom(2)
    pos = np.all(h2 > 0, axis=(3, 4))
    v = h1 / np.where(h2 > 0, h2, 1.0)
    vmin = v.min(axis=(3, 4))
    vmax = v.max(axis=(3, 4))
    lo = np.clip(np.floor(vmin - 2.0).astype(np.int64) // bv, 0, hi_cap)
    hi = np.clip(np.floor(vmax + 2.0).astype(np.int64) // bv, 0, hi_cap)
    lo = np.where(pos, lo, 0)
    hi = np.where(pos, hi, hi_cap)
    # Padded dummy views (_pad_views_invalid poisons tc row 2) have NO
    # valid pairs — their poisoned corners fail ``pos`` and would force
    # full-map windows on the whole sweep; give them 1-band windows
    # instead (the kernel's validity mask serves them vacuously).
    dead = (tc[:, 2] <= -big)[None, :, None]  # (1, V, 1) vs (cz, V, njt)
    lo = np.where(dead, 0, lo)
    hi = np.where(dead, 0, hi)
    n_bwin = int((hi - lo + 1).max()) if lo.size else 1
    # The window must fit the padded map: an + n_bwin <= n_bands. Shifting
    # an anchor left only widens coverage ([an, an + n_bwin) still holds
    # [lo, hi] because an + n_bwin - 1 >= n_bands - 1 >= hi).
    an = np.minimum(lo, n_bands - n_bwin)
    return np.transpose(an.astype(np.int32), (0, 2, 1)), n_bwin


def _project_subtile(tx_ref, ty_ref, tz_ref, tc_ref, vv, view, kk, jt, it,
                     *, sj, h, w):
    """Project one (sj, 128) voxel subtile into view ``view``: separable
    per-axis table adds -> perspective divide -> round-half-away -> bounds
    test (``CudaReconstruction.cu:168-205`` semantics). Returns
    (ui, vi, valid, zcam) with invalid lanes poisoned to pixel 0."""
    tx = tx_ref[vv]  # (4, cx)
    tys = ty_ref[vv, pl.ds(jt * sj, sj), :]  # (sj, 4)
    zc0 = tz_ref[kk, view, 0] + tc_ref[view, 0]
    zc1 = tz_ref[kk, view, 1] + tc_ref[view, 1]
    zc2 = tz_ref[kk, view, 2] + tc_ref[view, 2]
    zc3 = tz_ref[kk, view, 3] + tc_ref[view, 3]
    txs = tx[:, it * 128 : (it + 1) * 128]  # (4, 128)
    h0 = tys[:, 0:1] + (txs[0][None, :] + zc0)
    h1 = tys[:, 1:2] + (txs[1][None, :] + zc1)
    h2 = tys[:, 2:3] + (txs[2][None, :] + zc2)
    zcam = tys[:, 3:4] + (txs[3][None, :] + zc3)
    u = _round_half_away(h0 / h2)
    v = _round_half_away(h1 / h2)
    valid = (h2 >= 0) & (u >= 0) & (v >= 0) & (u < w) & (v < h)
    ui = jnp.where(valid, u, 0.0).astype(jnp.int32)
    vi = jnp.where(valid, v, 0.0).astype(jnp.int32)
    return ui, vi, valid, zcam


def _ray_potential_vals(zcam, d, *, thick, rho, eta, delta):
    """Piecewise TSDF ray potential (CudaReconstruction.cu:104-120)."""
    diff = zcam - d
    a = jnp.abs(diff)
    far = jnp.where(diff > 0, 0.0, -eta * rho)
    shell = rho * jnp.sign(diff)
    ramp = (rho / thick) * diff
    return jnp.where(a > delta, far, jnp.where(a > thick, shell, ramp))


def _integrate_kernel_hbm(
    tx_ref, ty_ref, tz_ref, tc_ref, depth_ref, vol_ref, out_ref,
    *, h, w, bv, wp, cy, cx, sj, wr, n_wc, n_k, thick, rho, eta, delta,
    split3, anchors,
):
    """Band-sweep kernel for the HBM-resident depth modes
    ('rowselh'/'rowsel3h') — NO depth-map size ceiling.

    Design (forced by the toolchain, docs/KERNEL.md "bisection status"):
    this Mosaic build crashes on every form of data-dependent staging —
    manual-DMA offsets from vector reductions / SMEM loads /
    scalar-prefetch refs, and Element-dim pipelined windows. So the depth
    map is swept in FULL-WIDTH horizontal bands of ``bv`` rows whose
    placement is a GRID AXIS (program_id-pure Blocked BlockSpec — the
    one proven-safe channel): grid (cz, n_jtb, V, n_bands), depth block
    ``(1, [3,] bv, wp)`` at index ``(view, [0,] band, 0)``.

    Per (subtile, view, band) the projected rows that land in the band
    are served by the SAME machinery as the whole-map modes — n_k
    one-hot select passes + exact VMEM-local remainder walk
    (:func:`_gather_pixels_multi` with hp=bv) — with coordinates rebased
    by ``band*bv`` (program-id arithmetic). Every valid pair lands in
    exactly ONE band, so the union over bands is exact and each voxel
    still accumulates each view exactly once, in view order —
    bit-identical to the whole-map modes at vb=1. Bands that intersect
    nothing are skipped behind a vector-reduced ``pl.when`` (legal for
    control flow; only DMA offsets were restricted).

    The reference streams any-size maps through global memory
    (``Reconstruction/CudaReconstruction.cu:320-331``); this is the TPU
    equivalent: HBM holds the map, VMEM sees one band at a time.
    """
    band = pl.program_id(3)
    v_base = band * bv  # program_id-pure scalar

    @pl.when((pl.program_id(2) == 0) & (band == 0))
    def _():
        out_ref[:] = vol_ref[:]

    view = pl.program_id(2)
    planes = (
        tuple(depth_ref.at[0, i] for i in range(3))
        if split3
        else (depth_ref.at[0],)
    )

    def jt_body(jt, _):
        for it in range(cx // 128):
            ui, vi, valid, zcam = _project_subtile(
                tx_ref, ty_ref, tz_ref, tc_ref, 0, view, 0, jt, it,
                sj=sj, h=h, w=w,
            )
            in_band = valid & (vi >= v_base) & (vi < v_base + bv)

            @pl.when(jnp.any(in_band))
            def _(it=it, ui=ui, vi=vi, in_band=in_band, zcam=zcam):
                vi_b = jnp.where(in_band, vi - v_base, 0)
                d = _gather_pixels_multi(
                    planes, ui, vi_b, in_band,
                    hp=bv, wp=wp, wr=min(wr, bv), n_wc=n_wc, n_k=n_k,
                    sum_planes=split3, anchors=anchors,
                )[0]
                ok = in_band & (d != -1.0)
                val = _ray_potential_vals(
                    zcam, d, thick=thick, rho=rho, eta=eta, delta=delta
                )
                sl = (0, pl.ds(jt * sj, sj), pl.ds(it * 128, 128))
                out_ref[sl] += jnp.where(ok, val, 0.0)

        return 0

    jax.lax.fori_loop(0, cy // sj, jt_body, 0)


def _integrate_kernel_hbw(
    an_ref, tx_ref, ty_ref, tz_ref, tc_ref, depth_ref, vol_ref,
    out_ref, miss_ref,
    *, h, w, bv, wp, cy, cx, sj, wr, n_wc, n_k, n_bwin, thick, rho, eta,
    delta, split3, anchors,
):
    """WINDOWED band-sweep kernel ('rowselw'/'rowsel3w'): the band-sweep
    (:func:`_integrate_kernel_hbm`) with the band grid axis shortened to a
    per-(z-slice, y-block, view) WINDOW of ``n_bwin`` bands, anchored by a
    host-computed conservative row-span (:func:`_window_band_bounds_host`)
    and placed through the scalar-prefetch-driven Blocked index_map — the
    one DYNAMIC staging channel this toolchain's Mosaic compiles (repro
    v20, docs/KERNEL.md). Out-of-window bands are neither staged nor
    stepped, removing the plain sweep's per-band projection re-run for
    bands a unit can never touch (the HD tax: n_bands ~ 9 at 1080p).

    Exactness: bands within the window are disjoint and each valid pair
    lands in exactly one, so coverage equals the plain sweep's whenever
    the window bound holds; pairs OUTSIDE the window (a violated bound —
    never observed; the host margin is conservative) are counted into
    ``miss_ref`` at the first band step and the CALLER re-dispatches the
    exact band-sweep mode — bit-identical results in every branch.
    """
    kk = pl.program_id(0)
    jb = pl.program_id(1)
    view = pl.program_id(2)
    b = pl.program_id(3)

    @pl.when((view == 0) & (b == 0))
    def _():
        out_ref[:] = vol_ref[:]

    @pl.when((kk == 0) & (jb == 0) & (view == 0) & (b == 0))
    def _():
        miss_ref[:] = jnp.zeros((sj, 128), jnp.int32)

    # SMEM read -> rebase/window arithmetic only (never a DMA offset; the
    # pipeline already placed the band block from the same value).
    a0 = an_ref[kk, jb, view]
    v_base = (a0 + b) * bv
    win_lo = a0 * bv
    win_hi = (a0 + n_bwin) * bv
    planes = (
        tuple(depth_ref.at[0, i] for i in range(3))
        if split3
        else (depth_ref.at[0],)
    )

    def jt_body(jt, _):
        for it in range(cx // 128):
            ui, vi, valid, zcam = _project_subtile(
                tx_ref, ty_ref, tz_ref, tc_ref, 0, view, 0, jt, it,
                sj=sj, h=h, w=w,
            )

            @pl.when(b == 0)
            def _(vi=vi, valid=valid):
                oow = valid & ((vi < win_lo) | (vi >= win_hi))
                miss_ref[:] += oow.astype(jnp.int32)

            in_band = valid & (vi >= v_base) & (vi < v_base + bv)

            @pl.when(jnp.any(in_band))
            def _(it=it, ui=ui, vi=vi, in_band=in_band, zcam=zcam):
                vi_b = jnp.where(in_band, vi - v_base, 0)
                d = _gather_pixels_multi(
                    planes, ui, vi_b, in_band,
                    hp=bv, wp=wp, wr=min(wr, bv), n_wc=n_wc, n_k=n_k,
                    sum_planes=split3, anchors=anchors,
                )[0]
                ok = in_band & (d != -1.0)
                val = _ray_potential_vals(
                    zcam, d, thick=thick, rho=rho, eta=eta, delta=delta
                )
                sl = (0, pl.ds(jt * sj, sj), pl.ds(it * 128, 128))
                out_ref[sl] += jnp.where(ok, val, 0.0)

        return 0

    jax.lax.fori_loop(0, cy // sj, jt_body, 0)


def _integrate_kernel_dyn(
    an_ref, tx_ref, ty_ref, tz_ref, tc_ref, da_ref, db_ref, vol_ref,
    out_ref, miss_ref,
    *, h, w, bv, wp, cy, cx, sj, wr, n_wc, n_k, thick, rho, eta, delta,
    split3, anchors,
):
    """Dynamic 2-band kernel ('rowseld'/'rowsel3d'): like the band-sweep
    (:func:`_integrate_kernel_hbm`) but instead of sweeping every band as
    a grid axis, TWO consecutive bands are staged per (z, y-block, view)
    step at a data-dependent band index — the scalar-prefetch-driven
    Blocked index_map channel, the one DYNAMIC staging mechanism this
    toolchain's Mosaic compiles (repro v20; every other channel 500s,
    docs/KERNEL.md). Eliminates the band sweep's n_bands projection tax.

    Exactness: the host anchor prepass (:func:`_dyn_band_anchors`) is
    conservative for h2>0-at-corners blocks; pairs the two bands do NOT
    serve (pole blocks, footprints taller than 2*bv) are counted into
    ``miss_ref`` and the CALLER re-dispatches the exact band-sweep mode
    — results are bit-identical in both branches (each voxel accumulates
    each view exactly once; the two bands are disjoint).
    """
    kk = pl.program_id(0)
    jb = pl.program_id(1)
    view = pl.program_id(2)

    @pl.when(view == 0)
    def _():
        out_ref[:] = vol_ref[:]

    @pl.when((kk == 0) & (jb == 0) & (view == 0))
    def _():
        miss_ref[:] = jnp.zeros((sj, 128), jnp.int32)

    # SMEM read -> VECTOR rebase arithmetic only (never a DMA offset;
    # the pipeline already placed the blocks from the same values).
    v_a = an_ref[kk, jb, view] * bv
    bands = []
    for ref, v0 in ((da_ref, v_a), (db_ref, v_a + bv)):
        planes = (
            tuple(ref.at[0, i] for i in range(3))
            if split3
            else (ref.at[0],)
        )
        bands.append((planes, v0))

    def jt_body(jt, _):
        for it in range(cx // 128):
            ui, vi, valid, zcam = _project_subtile(
                tx_ref, ty_ref, tz_ref, tc_ref, 0, view, 0, jt, it,
                sj=sj, h=h, w=w,
            )
            served = jnp.zeros(valid.shape, bool)
            sl = (0, pl.ds(jt * sj, sj), pl.ds(it * 128, 128))
            for planes, v0 in bands:
                in_b = valid & (vi >= v0) & (vi < v0 + bv)
                served |= in_b

                # Units typically land in ONE of the two bands — skip
                # the other's gather+selects+RMW entirely (the same
                # vector-reduced pl.when the band-sweep uses).
                @pl.when(jnp.any(in_b))
                def _(planes=planes, v0=v0, in_b=in_b, ui=ui, vi=vi,
                      zcam=zcam, sl=sl):
                    vi_b = jnp.where(in_b, vi - v0, 0)
                    d = _gather_pixels_multi(
                        planes, ui, vi_b, in_b,
                        hp=bv, wp=wp, wr=min(wr, bv), n_wc=n_wc, n_k=n_k,
                        sum_planes=split3, anchors=anchors,
                    )[0]
                    ok = in_b & (d != -1.0)
                    val = _ray_potential_vals(
                        zcam, d, thick=thick, rho=rho, eta=eta, delta=delta
                    )
                    out_ref[sl] += jnp.where(ok, val, 0.0)

            miss_ref[:] += (valid & ~served).astype(jnp.int32)
        return 0

    jax.lax.fori_loop(0, cy // sj, jt_body, 0)


def _integrate_kernel_v2(
    tx_ref, ty_ref, tz_ref, tc_ref, depth_ref, vol_ref, out_ref,
    *refs,
    h, w, hp, wp, cy, cx, sj, wr, n_wc, n_k, thick, rho, eta, delta,
    split3=False, track_miss=False, hbm=False, anchors="exact",
    skip_dead=False,
):
    """Row-select-matmul kernel (v2 fast path).

    Same contract as :func:`_integrate_kernel` (the round-1 windowed
    kernel, kept as ``mode='windows'``), but the (8, 128)-window row
    gather+select loop is replaced by per-voxel-row selection:

    * orientation grouping keeps image-v nearly constant along the lane
      axis, so per voxel row the projected v spans only ~n_k distinct
      values above the row minimum;
    * a (wr, 128)-row window anchored below the subtile's v minimum is
      covered by ``n_k`` one-hot matmul passes (``_rowsel_pass``);
    * everything the static passes miss (v-span > wr, u-span > 128*n_wc,
      per-row deviation > n_k-1) is EXACTLY covered by a generic
      while-walk over the bbox of still-uncovered voxels — zero
      iterations in the common case (same zero-iteration-remainder
      philosophy the round-1 kernel measured as optimal vs lax.cond);
    * ``vb`` views are processed per grid step (their per-view
      contributions accumulate in registers before ONE VMEM RMW per
      subtile), amortizing the fixed per-step costs that dominate at
      smaller grids.

    track_miss=True (modes 'rowselm'/'rowsel3m'): the in-kernel remainder
    machinery — measured at 72% of kernel time for ZERO common-case work —
    is skipped entirely; voxels the static passes did not cover contribute
    NOTHING and are counted into ``miss_ref`` (an (sj, 128) i32 buffer
    accumulated across every grid step). The CALLER re-dispatches the
    exact kernel when the total is nonzero (see ``pallas_integrate`` /
    ``OrientedFusionPlan.run``), so results remain exact for arbitrary
    geometry with the remainder cost paid only on actual misses.

    hbm modes ('rowselh'/'rowsel3h') use the dedicated band-sweep kernel
    :func:`_integrate_kernel_hbm` instead of this one.
    """
    del hbm
    miss_ref = None
    if track_miss:
        (miss_ref,) = refs
    vb = depth_ref.shape[0]
    kzn = out_ref.shape[0]  # z-slices per volume block (kz)

    @pl.when(pl.program_id(2) == 0)
    def _():
        out_ref[:] = vol_ref[:]

    if track_miss:
        first = (
            (pl.program_id(0) == 0)
            & (pl.program_id(1) == 0)
            & (pl.program_id(2) == 0)
        )

        @pl.when(first)
        def _():
            miss_ref[:] = jnp.zeros((sj, 128), jnp.int32)

    view0 = pl.program_id(2) * vb

    # kz > 1 amortizes the per-grid-step depth-block DMA over kz z-slices
    # (total depth HBM traffic / kz; the volume block still accumulates all
    # views in VMEM, so volume traffic is unchanged). Per-voxel view
    # accumulation ORDER is unchanged — results are bit-identical for any
    # kz, unlike vb (cost model: docs/KERNEL.md round-2.6). kz == 1 keeps
    # kk static (the proven round-2.5 lowering — no dynamic leading-dim
    # slices on the shipped default path).
    def kz_jt_body(kk, jt):
        for it in range(cx // 128):
            if skip_dead and vb == 1 and kzn == 1 and not track_miss:
                # Dead-unit early-out (round 4, OPT-IN per group):
                # subtile-views whose footprint misses the image entirely
                # — frustum-partial views, close-ups, mapping scans —
                # skip the whole gather/select/walk/RMW behind one
                # any-reduction, the same vector-reduced pl.when the
                # band-sweep kernels use. Measured: the predicated
                # structure taxes LIVE units ~9%, so this variant is
                # routed only when the sampled dead fraction clears
                # SKIP_DEAD_FRAC (skip_dead='auto' in the plan).
                ui, vi, valid, zcam = _project_subtile(
                    tx_ref, ty_ref, tz_ref, tc_ref, 0, view0, kk, jt, it,
                    sj=sj, h=h, w=w,
                )

                @pl.when(jnp.any(valid))
                def _(it=it, ui=ui, vi=vi, valid=valid, zcam=zcam):
                    gp_planes = (
                        tuple(depth_ref.at[0, i] for i in range(3))
                        if split3
                        else (depth_ref.at[0],)
                    )
                    d = _gather_pixels_multi(
                        gp_planes, ui, vi, valid,
                        hp=hp, wp=wp, wr=wr, n_wc=n_wc, n_k=n_k,
                        sum_planes=split3, anchors=anchors,
                    )[0]
                    ok = valid & (d != -1.0)
                    val = _ray_potential_vals(
                        zcam, d, thick=thick, rho=rho, eta=eta, delta=delta
                    )
                    sl = (0, pl.ds(jt * sj, sj), pl.ds(it * 128, 128))
                    out_ref[sl] += jnp.where(ok, val, 0.0)

                continue
            acc = jnp.zeros((sj, 128), jnp.float32)
            for vv in range(vb):
                view = view0 + vv
                if split3:
                    # (3, hp, wp): exact hi/mid/lo split planes.
                    planes = tuple(depth_ref.at[vv, i] for i in range(3))
                else:
                    depth = depth_ref.at[vv]  # (hp, wp)
                ui, vi, valid, zcam = _project_subtile(
                    tx_ref, ty_ref, tz_ref, tc_ref, vv, view, kk, jt, it,
                    sj=sj, h=h, w=w,
                )

                if track_miss:
                    gp_planes = planes if split3 else (depth,)
                    ds_, covered = _gather_pixels_multi(
                        gp_planes, ui, vi, valid,
                        hp=hp, wp=wp, wr=wr, n_wc=n_wc, n_k=n_k,
                        sum_planes=split3, fallback=False, anchors=anchors,
                    )
                    d = ds_[0]
                    miss_ref[:] += (valid & ~covered).astype(jnp.int32)
                    valid &= covered & (d != -1.0)
                else:
                    gp_planes = planes if split3 else (depth,)
                    d = _gather_pixels_multi(
                        gp_planes, ui, vi, valid,
                        hp=hp, wp=wp, wr=wr, n_wc=n_wc, n_k=n_k,
                        sum_planes=split3, anchors=anchors,
                    )[0]
                    valid &= d != -1.0
                val = _ray_potential_vals(
                    zcam, d, thick=thick, rho=rho, eta=eta, delta=delta
                )
                acc = acc + jnp.where(valid, val, 0.0)
            if kzn == 1:
                sl = (0, pl.ds(jt * sj, sj), pl.ds(it * 128, 128))
                out_ref[sl] += acc
            else:
                sl = (
                    pl.ds(kk, 1),
                    pl.ds(jt * sj, sj),
                    pl.ds(it * 128, 128),
                )
                out_ref[sl] += acc[None]

    def kz_body(kk, _):
        def jt_body(jt, _):
            kz_jt_body(kk, jt)
            return 0

        jax.lax.fori_loop(0, cy // sj, jt_body, 0)
        return 0

    if kzn == 1:
        kz_body(0, 0)
    else:
        jax.lax.fori_loop(0, kzn, kz_body, 0)


def _integrate_kernel(
    tx_ref, ty_ref, tz_ref, tc_ref, depth_ref, vol_ref, out_ref,
    *, h, w, hp, wp, cy, cx, sj, n_wr, n_wc, thick, rho, eta, delta,
):
    # h/w: REAL image dims (bounds tests); hp/wp: padded depth-block dims.
    view = pl.program_id(2)

    @pl.when(view == 0)
    def _():
        out_ref[:] = vol_ref[:]

    tx = tx_ref[0]  # (4, cx)
    depth = depth_ref.at[0]  # (hp, wp) ref view for dynamic windows

    # Per-row constants for this z-slice: tz[r] + tc[r] (SMEM scalars; tz is
    # laid out (cz, V, 4) so the k-block is (1, V, 4)).
    zc0 = tz_ref[0, view, 0] + tc_ref[view, 0]
    zc1 = tz_ref[0, view, 1] + tc_ref[view, 1]
    zc2 = tz_ref[0, view, 2] + tc_ref[view, 2]
    zc3 = tz_ref[0, view, 3] + tc_ref[view, 3]

    big = jnp.int32(1 << 30)

    def jt_body(jt, _):
        # ty is laid out (V, cy, 4): sublane-dim slicing stays 8-aligned.
        tys = ty_ref[0, pl.ds(jt * sj, sj), :]  # (sj, 4)
        for it in range(cx // 128):
            txs = tx[:, it * 128 : (it + 1) * 128]  # (4, 128)
            h0 = tys[:, 0:1] + (txs[0][None, :] + zc0)
            h1 = tys[:, 1:2] + (txs[1][None, :] + zc1)
            h2 = tys[:, 2:3] + (txs[2][None, :] + zc2)
            zcam = tys[:, 3:4] + (txs[3][None, :] + zc3)
            u = _round_half_away(h0 / h2)
            v = _round_half_away(h1 / h2)
            valid = (h2 >= 0) & (u >= 0) & (v >= 0) & (u < w) & (v < h)
            ui = jnp.where(valid, u, 0.0).astype(jnp.int32)
            vi = jnp.where(valid, v, 0.0).astype(jnp.int32)

            # Footprint bbox -> aligned window-grid origin (clamped so the
            # static grid stays inside the padded image).
            v_lo = jnp.min(jnp.where(valid, vi, big))
            u_lo = jnp.min(jnp.where(valid, ui, big))
            v_hi = jnp.max(jnp.where(valid, vi, -1))
            u_hi = jnp.max(jnp.where(valid, ui, -1))
            # Static (n_wr, n_wc) aligned window grid anchored at the
            # footprint minimum covers the common case branch-free. The
            # remainder (an L-shape: rows below the grid across the full
            # column span, plus columns right of the grid within the grid's
            # rows) is covered by while-loops that execute ZERO iterations
            # when the footprint fits — `lax.cond` tiering measured ~2x
            # slower than this branchless structure on v5e.
            v0 = jnp.clip((v_lo // 8) * 8, 0, hp - 8 * n_wr)
            u0 = jnp.clip((u_lo // 128) * 128, 0, wp - 128 * n_wc)
            d = jnp.zeros(valid.shape, jnp.float32)
            for wr in range(n_wr):
                for wc in range(n_wc):
                    rs = pl.multiple_of(v0 + 8 * wr, 8)
                    cs = pl.multiple_of(u0 + 128 * wc, 128)
                    d = _window_pass1(depth, rs, cs, ui, vi, valid, d)

            # Remainder B: columns right of the grid, within the grid's rows.
            for wr in range(n_wr):
                rs = pl.multiple_of(v0 + 8 * wr, 8)

                def colb_cond(cc):
                    return cc[0] <= u_hi

                def colb_body(cc, rs=rs):
                    cs, cacc = cc
                    cacc = _window_pass1(
                        depth, rs, pl.multiple_of(cs, 128), ui, vi, valid, cacc
                    )
                    return cs + 128, cacc

                _, d = jax.lax.while_loop(
                    colb_cond, colb_body, (u0 + 128 * n_wc, d)
                )

            # Remainder A: rows below the grid, across the full column span.
            def rowa_cond(c):
                return c[0] <= v_hi

            def rowa_body(c):
                rs, acc = c

                def cola_cond(cc):
                    return cc[0] <= u_hi

                def cola_body(cc):
                    cs, cacc = cc
                    cacc = _window_pass1(
                        depth,
                        pl.multiple_of(rs, 8),
                        pl.multiple_of(cs, 128),
                        ui, vi, valid, cacc,
                    )
                    return cs + 128, cacc

                _, acc = jax.lax.while_loop(cola_cond, cola_body, (u0, acc))
                return rs + 8, acc

            _, d = jax.lax.while_loop(rowa_cond, rowa_body, (v0 + 8 * n_wr, d))

            valid &= d != -1.0
            # Ray potential (CudaReconstruction.cu:104-120).
            diff = zcam - d
            a = jnp.abs(diff)
            far = jnp.where(diff > 0, 0.0, -eta * rho)
            shell = rho * jnp.sign(diff)
            ramp = (rho / thick) * diff
            val = jnp.where(a > delta, far, jnp.where(a > thick, shell, ramp))
            contrib = jnp.where(valid, val, 0.0)
            sl = (0, pl.ds(jt * sj, sj), pl.ds(it * 128, 128))
            out_ref[sl] += contrib
        return 0

    jax.lax.fori_loop(0, cy // sj, jt_body, 0)


def split_depth_planes(depths):
    """Split (..., hp, wp) fp32 depth maps into 3 bf16-VALUED fp32 planes
    (hi/mid/lo, stacked on a new axis -3) whose fp32 sum reconstructs the
    input BIT-EXACTLY: each plane is the round-to-nearest bf16 of the
    remaining residual, so the three carry non-overlapping ~8-bit mantissa
    segments of the 24-bit fp32 significand (the same decomposition XLA's
    own 6-pass HIGHEST matmul uses). Planes are stored upcast to fp32 so
    VMEM slicing keeps fp32 (8, 128) alignment; a DEFAULT-precision TPU dot
    converts them to bf16 losslessly.

    Accepts numpy (host split) or jax arrays (device split, jit-safe) —
    device-resident pipelines (e.g. scripts/capstone_1024.py renders depth
    maps on-chip) must never round-trip through the host."""
    if isinstance(depths, jax.Array):
        # The barriers are LOAD-BEARING under jit: XLA's excess-precision
        # simplification cancels convert(f32->bf16->f32) pairs, which would
        # collapse the split (hi == d, mid == lo == 0) and silently hand
        # the kernel's DEFAULT-precision dots a truncating bf16 input.
        # Measured on v5e: the sharded in-chain split diverged (checksum
        # 127729 vs 121116) until cut; bench.py's sharded_split_match
        # gate pins it bitwise every round.
        d = depths.astype(jnp.float32)
        hi = jax.lax.optimization_barrier(
            d.astype(jnp.bfloat16)
        ).astype(jnp.float32)
        r = d - hi
        mid = jax.lax.optimization_barrier(
            r.astype(jnp.bfloat16)
        ).astype(jnp.float32)
        return jnp.stack([hi, mid, r - mid], axis=-3)
    import ml_dtypes

    d = np.ascontiguousarray(np.asarray(depths, np.float32))
    hi = d.astype(ml_dtypes.bfloat16).astype(np.float32)
    r = d - hi
    mid = r.astype(ml_dtypes.bfloat16).astype(np.float32)
    lo = r - mid  # <= 8 significant bits left: exactly bf16-valued
    return np.stack([hi, mid, lo], axis=-3)


def _pallas_integrate_impl(
    volume, tx, ty, tz, tc, depths, *, h, w, sj, n_wr, n_wc,
    thick, rho, eta, delta, mode="windows", wr=32, n_k=2, vb=1, kz=1,
    anchors="exact", band_anchors=None, n_bwin=0, skip_dead=False,
):
    cz, cy, cx = volume.shape
    split3 = mode in ("rowsel3", "rowsel3m", "rowsel3h", "rowsel3d",
                      "rowsel3w")
    track_miss = mode in ("rowselm", "rowsel3m")
    hbm = mode in ("rowselh", "rowsel3h")
    dyn = mode in ("rowseld", "rowsel3d")
    hbw = mode in ("rowselw", "rowsel3w")
    if split3:
        nviews, _three, hp, wp = depths.shape
    else:
        nviews, hp, wp = depths.shape
    if cy % sj or cx % 128:
        raise ValueError(
            f"volume (cy={cy}, cx={cx}) must be padded to multiples of "
            f"(subtile_rows={sj}, 128); see pad_volume/OrientedFusionPlan"
        )
    if mode not in ("rowsel", "rowsel3", "rowselm", "rowsel3m"):
        vb = 1  # hbm modes: the whole depth array stays in HBM, no blocks
    # The (vb, [3,] hp, wp) depth block is double-buffered; keep it within
    # DEPTH_VMEM_BUDGET (rowsel3 triples depth bytes). NOTE: vb changes the
    # fp32 accumulation ORDER across grid steps (vb views sum in registers
    # before one VMEM RMW), so results are bit-stable only at fixed vb.
    depth_bytes = (3 if split3 else 1) * hp * wp * 4
    while vb > 1 and vb * depth_bytes * 2 > DEPTH_VMEM_BUDGET:
        vb -= 1
    while nviews % vb:
        vb -= 1  # plan pads views to a multiple of 8; fall back gracefully
    cy_b = _volume_y_block(cy, cx, sj)
    n_jtb = cy // cy_b
    # kz z-slices per volume block (amortizes the depth-block DMA; results
    # bit-identical at any kz). Clamp to a divisor of cz and to ~4 MiB of
    # block bytes so the (kz, cy_b, cx) block + the double-buffered depth
    # block stay inside scoped VMEM.
    kz = max(1, int(kz))
    if mode == "windows" or hbm or dyn or hbw:
        kz = 1
    while kz > 1 and (cz % kz or kz * cy_b * cx * 4 > (4 << 20)):
        kz -= 1
    if dyn:
        # Dynamic 2-band staging (scalar-prefetch index maps, repro v20).
        bv = _dyn_band_rows(wp, split3)
        if hp % bv or hp < 2 * bv:
            raise ValueError(
                f"dyn modes need depth maps padded to >=2 bands "
                f"(hp={hp}, bv={bv}); pallas_integrate/OrientedFusionPlan "
                f"pad automatically — pad manually for direct calls"
            )
        # y-block height trades DMA amortization (the band pair is
        # re-fetched per block) against footprint tightness (bigger
        # blocks project taller than the 2-band window -> fallback).
        cy_b = max(sj, (min(cy_b, DYN_CY_B) // sj) * sj)
        while cy % cy_b:
            cy_b -= sj
        n_jtb = cy // cy_b
        kernel = functools.partial(
            _integrate_kernel_dyn,
            h=h, w=w, bv=bv, wp=wp, cy=cy_b, cx=cx, sj=sj,
            wr=min(wr, bv), n_wc=n_wc, n_k=n_k,
            thick=thick, rho=rho, eta=eta, delta=delta,
            split3=split3, anchors=anchors,
        )
        an = _dyn_band_anchors(tx, ty, tz, tc, cy_b=cy_b, bv=bv, hp=hp)
        if split3:
            band_shape = (1, 3, bv, wp)
            band_map = lambda off: (
                lambda k, jb, v, an_: (v, 0, an_[k, jb, v] + off, 0)
            )
        else:
            band_shape = (1, bv, wp)
            band_map = lambda off: (
                lambda k, jb, v, an_: (v, an_[k, jb, v] + off, 0)
            )
        grid_spec = pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=1,
            grid=(cz, n_jtb, nviews),
            in_specs=[
                pl.BlockSpec((1, 4, cx), lambda k, jb, v, an_: (v, 0, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((1, cy_b, 4),
                             lambda k, jb, v, an_: (v, jb, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((1, nviews, 4),
                             lambda k, jb, v, an_: (k, 0, 0),
                             memory_space=pltpu.SMEM),
                pl.BlockSpec((nviews, 4), lambda k, jb, v, an_: (0, 0),
                             memory_space=pltpu.SMEM),
                pl.BlockSpec(band_shape, band_map(0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec(band_shape, band_map(1),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((1, cy_b, cx),
                             lambda k, jb, v, an_: (k, jb, 0),
                             memory_space=pltpu.VMEM),
            ],
            out_specs=(
                pl.BlockSpec((1, cy_b, cx),
                             lambda k, jb, v, an_: (k, jb, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((sj, 128), lambda k, jb, v, an_: (0, 0),
                             memory_space=pltpu.VMEM),
            ),
        )
        out, miss = pl.pallas_call(
            kernel,
            out_shape=(
                jax.ShapeDtypeStruct((cz, cy, cx), jnp.float32),
                jax.ShapeDtypeStruct((sj, 128), jnp.int32),
            ),
            grid_spec=grid_spec,
            cost_estimate=pl.CostEstimate(
                flops=40 * cz * cy * cx * nviews,
                bytes_accessed=4 * cz * cy * cx * 2
                + (3 if split3 else 1) * 2 * bv * wp * 4
                * cz * n_jtb * nviews,
                transcendentals=0,
            ),
            interpret=INTERPRET,
        )(an, tx, ty, tz, tc, depths, depths, volume)
        return out, jnp.sum(miss, dtype=jnp.float32)
    if hbw:
        # Windowed band-sweep: per-unit band windows via scalar-prefetch
        # index maps (see _integrate_kernel_hbw). band_anchors/n_bwin are
        # HOST-computed (the window length is a static grid extent), so
        # this branch is only reachable through pallas_integrate /
        # OrientedFusionPlan, which own the planning.
        bv = _hbm_band_rows(wp, split3, min(wr, hp))
        if hp % bv:
            raise ValueError(
                f"windowed band modes need depth maps padded to band "
                f"multiples (hp={hp}, bv={bv}); pallas_integrate/"
                f"OrientedFusionPlan pad automatically"
            )
        if band_anchors is None or n_bwin < 1:
            raise ValueError(
                "mode='rowselw'/'rowsel3w' needs host-computed band "
                "windows; call via pallas_integrate or OrientedFusionPlan"
            )
        cy_b = _hbw_y_block(cy, cx, sj)
        n_jtb = cy // cy_b
        kernel = functools.partial(
            _integrate_kernel_hbw,
            h=h, w=w, bv=bv, wp=wp, cy=cy_b, cx=cx, sj=sj,
            wr=min(wr, bv), n_wc=n_wc, n_k=n_k, n_bwin=int(n_bwin),
            thick=thick, rho=rho, eta=eta, delta=delta,
            split3=split3, anchors=anchors,
        )
        if split3:
            band_shape = (1, 3, bv, wp)
            band_map = lambda k, jb, v, b, an_: (v, 0, an_[k, jb, v] + b, 0)
        else:
            band_shape = (1, bv, wp)
            band_map = lambda k, jb, v, b, an_: (v, an_[k, jb, v] + b, 0)
        grid_spec = pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=1,
            grid=(cz, n_jtb, nviews, int(n_bwin)),
            in_specs=[
                pl.BlockSpec((1, 4, cx),
                             lambda k, jb, v, b, an_: (v, 0, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((1, cy_b, 4),
                             lambda k, jb, v, b, an_: (v, jb, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((1, nviews, 4),
                             lambda k, jb, v, b, an_: (k, 0, 0),
                             memory_space=pltpu.SMEM),
                pl.BlockSpec((nviews, 4),
                             lambda k, jb, v, b, an_: (0, 0),
                             memory_space=pltpu.SMEM),
                pl.BlockSpec(band_shape, band_map,
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((1, cy_b, cx),
                             lambda k, jb, v, b, an_: (k, jb, 0),
                             memory_space=pltpu.VMEM),
            ],
            out_specs=(
                pl.BlockSpec((1, cy_b, cx),
                             lambda k, jb, v, b, an_: (k, jb, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((sj, 128),
                             lambda k, jb, v, b, an_: (0, 0),
                             memory_space=pltpu.VMEM),
            ),
        )
        out, miss = pl.pallas_call(
            kernel,
            out_shape=(
                jax.ShapeDtypeStruct((cz, cy, cx), jnp.float32),
                jax.ShapeDtypeStruct((sj, 128), jnp.int32),
            ),
            grid_spec=grid_spec,
            cost_estimate=pl.CostEstimate(
                flops=40 * cz * cy * cx * nviews,
                # Band staging reads n_bwin of n_bands bands per
                # (z-slice, y-block, view) — the windowed fraction of the
                # plain sweep's depth traffic.
                bytes_accessed=4 * cz * cy * cx * 2
                + (3 if split3 else 1) * bv * wp * 4
                * int(n_bwin) * cz * n_jtb * nviews,
                transcendentals=0,
            ),
            interpret=INTERPRET,
        )(band_anchors, tx, ty, tz, tc, depths, volume)
        return out, jnp.sum(miss, dtype=jnp.float32)
    if hbm:
        # Band-sweep: full-width (bv, wp) depth bands as a 4th GRID axis —
        # placement is program_id-pure (the only staging channel this
        # toolchain's Mosaic compiles; see _integrate_kernel_hbm).
        bv = _hbm_band_rows(wp, split3, min(wr, hp))
        if hp % bv:
            raise ValueError(
                f"hbm modes need depth maps padded to band multiples "
                f"(hp={hp}, bv={bv}); pallas_integrate/OrientedFusionPlan "
                f"pad automatically — pad manually for direct calls"
            )
        n_bands = hp // bv
        kernel = functools.partial(
            _integrate_kernel_hbm,
            h=h, w=w, bv=bv, wp=wp, cy=cy_b, cx=cx, sj=sj,
            wr=min(wr, bv), n_wc=n_wc, n_k=n_k,
            thick=thick, rho=rho, eta=eta, delta=delta,
            split3=split3, anchors=anchors,
        )
        if split3:
            depth_spec = pl.BlockSpec(
                (1, 3, bv, wp), lambda k, jb, v, b: (v, 0, b, 0),
                memory_space=pltpu.VMEM,
            )
        else:
            depth_spec = pl.BlockSpec(
                (1, bv, wp), lambda k, jb, v, b: (v, b, 0),
                memory_space=pltpu.VMEM,
            )
        return pl.pallas_call(
            kernel,
            out_shape=jax.ShapeDtypeStruct((cz, cy, cx), jnp.float32),
            grid=(cz, n_jtb, nviews, n_bands),
            in_specs=[
                pl.BlockSpec((1, 4, cx), lambda k, jb, v, b: (v, 0, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((1, cy_b, 4), lambda k, jb, v, b: (v, jb, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((1, nviews, 4), lambda k, jb, v, b: (k, 0, 0),
                             memory_space=pltpu.SMEM),
                pl.BlockSpec((nviews, 4), lambda k, jb, v, b: (0, 0),
                             memory_space=pltpu.SMEM),
                depth_spec,
                pl.BlockSpec((1, cy_b, cx), lambda k, jb, v, b: (k, jb, 0),
                             memory_space=pltpu.VMEM),
            ],
            out_specs=pl.BlockSpec(
                (1, cy_b, cx), lambda k, jb, v, b: (k, jb, 0),
                memory_space=pltpu.VMEM,
            ),
            input_output_aliases={5: 0},
            cost_estimate=pl.CostEstimate(
                flops=40 * cz * cy * cx * nviews,
                # Band staging re-reads the padded map once per
                # (z-slice, y-block, view) — the same depth traffic as the
                # whole-map modes; the volume is read+written once.
                bytes_accessed=4 * cz * cy * cx * 2
                + (3 if split3 else 1) * hp * wp * 4 * cz * n_jtb * nviews,
                transcendentals=0,
            ),
            interpret=INTERPRET,
        )(tx, ty, tz, tc, depths, volume)
    if mode in ("rowsel", "rowsel3", "rowselm", "rowsel3m"):
        kernel = functools.partial(
            _integrate_kernel_v2,
            h=h, w=w, hp=hp, wp=wp, cy=cy_b, cx=cx, sj=sj,
            wr=min(wr, hp), n_wc=n_wc, n_k=n_k,
            thick=thick, rho=rho, eta=eta, delta=delta,
            split3=split3, track_miss=track_miss, anchors=anchors,
            skip_dead=bool(skip_dead),
        )
    else:
        kernel = functools.partial(
            _integrate_kernel,
            h=h, w=w, hp=hp, wp=wp, cy=cy_b, cx=cx, sj=sj, n_wr=n_wr, n_wc=n_wc,
            thick=thick, rho=rho, eta=eta, delta=delta,
        )
    vol_shape = jax.ShapeDtypeStruct((cz, cy, cx), jnp.float32)
    vol_spec = pl.BlockSpec(
        (kz, cy_b, cx), lambda k, jb, v: (k, jb, 0), memory_space=pltpu.VMEM
    )
    if track_miss:
        out_shape = (vol_shape, jax.ShapeDtypeStruct((sj, 128), jnp.int32))
        out_specs = (
            vol_spec,
            pl.BlockSpec(
                (sj, 128), lambda k, jb, v: (0, 0), memory_space=pltpu.VMEM
            ),
        )
    else:
        out_shape, out_specs = vol_shape, vol_spec
    if split3:
        depth_spec = pl.BlockSpec(
            (vb, 3, hp, wp), lambda k, jb, v: (v, 0, 0, 0),
            memory_space=pltpu.VMEM,
        )
        scratch_shapes = []
    else:
        depth_spec = pl.BlockSpec(
            (vb, hp, wp), lambda k, jb, v: (v, 0, 0),
            memory_space=pltpu.VMEM,
        )
        scratch_shapes = []
    flops_per_upd = 40
    res = pl.pallas_call(
        kernel,
        out_shape=out_shape,
        grid=(cz // kz, n_jtb, nviews // vb),
        in_specs=[
            pl.BlockSpec((vb, 4, cx), lambda k, jb, v: (v, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((vb, cy_b, 4), lambda k, jb, v: (v, jb, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((kz, nviews, 4), lambda k, jb, v: (k, 0, 0), memory_space=pltpu.SMEM),
            pl.BlockSpec((nviews, 4), lambda k, jb, v: (0, 0), memory_space=pltpu.SMEM),
            depth_spec,
            pl.BlockSpec((kz, cy_b, cx), lambda k, jb, v: (k, jb, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=out_specs,
        input_output_aliases={5: 0},
        scratch_shapes=scratch_shapes,
        cost_estimate=pl.CostEstimate(
            flops=flops_per_upd * cz * cy * cx * nviews,
            bytes_accessed=4 * cz * cy * cx * 2 + 4 * nviews * hp * wp,
            transcendentals=0,
        ),
        interpret=INTERPRET,
    )(tx, ty, tz, tc, depths, volume)
    if track_miss:
        out, miss = res
        # Per-element int32 counts stay < 2^22 (grid steps per position),
        # but the TOTAL reaches 1.7e10 at 1024^3 x 16 — sum in f32, whose
        # non-negative rounding keeps zero iff all-zero (the re-dispatch
        # test); the count is then approximate above 2^24, which is fine
        # for diagnostics.
        return out, jnp.sum(miss, dtype=jnp.float32)
    return res


_pallas_integrate_padded = functools.partial(
    jax.jit,
    static_argnames=("h", "w", "sj", "n_wr", "n_wc", "thick", "rho", "eta",
                     "delta", "mode", "wr", "n_k", "vb", "kz", "anchors",
                     "n_bwin", "skip_dead"),
    donate_argnames=("volume",),
)(_pallas_integrate_impl)

# Miss-tracking modes keep the input volume alive so the exact re-dispatch
# can consume it on a miss — no donation.
_pallas_integrate_padded_keep = functools.partial(
    jax.jit,
    static_argnames=("h", "w", "sj", "n_wr", "n_wc", "thick", "rho", "eta",
                     "delta", "mode", "wr", "n_k", "vb", "kz", "anchors",
                     "n_bwin", "skip_dead"),
)(_pallas_integrate_impl)


def pad_volume(
    volume: np.ndarray, subtile_rows: int = 16
) -> tuple[np.ndarray, tuple[int, int, int]]:
    """Pad (cz, cy, cx) so cy % subtile_rows == 0 and cx % 128 == 0."""
    cz, cy, cx = volume.shape
    py = (-cy) % subtile_rows
    px = (-cx) % 128
    if py or px:
        volume = np.pad(volume, ((0, 0), (0, py), (0, px)))
    return volume, (cz, cy, cx)


def unpad_volume(volume, orig_shape):
    cz, cy, cx = orig_shape
    return volume[:cz, :cy, :cx]


def pallas_integrate(
    volume,  # (cz, cy, cx) f32 device/host array (cy%8==0, cx%128==0)
    tables_tx,  # (V, 4, cx) f32
    tables_ty,  # (V, 4, cy) f32
    tables_tz,  # (V, 4, cz) f32
    tables_tc,  # (V, 4) f32
    depths,  # (V, h, w) f32; -1 = invalid sentinel
    thick: float, rho: float, eta: float, delta: float,
    windows: tuple[int, int] = (3, 2),
    subtile_rows: int = 16,
    mode: str = "rowsel",
    window_rows: int = 32,
    rowsel_passes: int = 2,
    view_block: int = 1,
    z_block: int = 1,
    anchors: str = "exact",
    skip_dead: bool = False,
):
    """Fuse all views into `volume` (returns the updated volume).

    Depth maps are padded to (8, 128) multiples with the -1 invalid sentinel;
    bounds tests inside the kernel use the REAL h/w, so padding never
    contributes.

    mode='rowsel' (default): one-hot-matmul row selection
    (:func:`_integrate_kernel_v2`) with `window_rows` image rows per window
    and `rowsel_passes` static passes. mode='rowsel3': same kernel, but the
    depth map is pre-split into 3 exact bf16-valued planes
    (:func:`split_depth_planes`) so the select dots run at DEFAULT precision
    (3 MXU passes total vs HIGHEST's 6) — bit-identical output, ~3x the
    depth VMEM footprint; the production default on TPU.

    mode='rowselm'/'rowsel3m' — COVERAGE DIAGNOSTICS, measured SLOWER for
    production sweeps (1278 vs 1015 ms whole-sweep @512^3x32, see
    docs/KERNEL.md "coverage sweep"): same selection, but the in-kernel
    remainder walk is replaced by a miss COUNT; on a nonzero count this
    function re-dispatches the matching exact mode on the preserved input —
    results are bit-identical to the exact mode in both branches, but ANY
    miss wastes the fast pass. Use them to measure static-pass coverage of
    a geometry, or for workloads KNOWN to cover statically (miss == 0);
    don't ship them as the default.

    mode='rowselh'/'rowsel3h' — HBM band-sweep: depth maps stay in HBM
    and are staged as full-width bands on a grid axis, so there is NO
    depth-map size ceiling (HD/4K run; 6-8x the XLA fallback measured,
    docs/KERNEL.md). Oversized maps auto-route here via _vmem_safe_mode;
    bit-identical to the whole-map modes.

    mode='rowseld'/'rowsel3d' — EXPERIMENTAL dynamic 2-band staging
    (scalar-prefetch index maps): measured SLOWER than the band-sweep on
    the probe rigs (docs/KERNEL.md); exact via an automatic band-sweep
    re-dispatch when any pair escapes the two staged bands.

    mode='rowselw'/'rowsel3w' — WINDOWED band-sweep: the band sweep with
    its band axis shortened per (z-slice, y-block, view) to a host-planned
    conservative row-span window (scalar-prefetch index maps), so bands a
    unit cannot touch are neither staged nor stepped — targets HD maps,
    where the plain sweep re-runs projection per band. Exact via the same
    automatic plain-sweep re-dispatch on any out-of-window pair; falls
    back to 'rowselh'/'rowsel3h' under tracing (window planning is a host
    computation).

    mode='windows': the round-1 windowed gather kernel with a static
    `windows` grid. All modes are exact for ANY geometry, so the tunables
    affect speed, never values.

    z_block (kz): z-slices per volume block — the depth-block HBM->VMEM
    DMA (one per grid step) amortizes over kz slices, dividing total depth
    traffic by kz; per-voxel view accumulation order is unchanged, so
    results are BIT-IDENTICAL at any kz (view_block, by contrast, reorders
    the fp32 accumulation). Clamped to a divisor of cz and a ~4 MiB block.
    """
    h, w = int(depths.shape[1]), int(depths.shape[2])
    depths_orig = depths  # for the dyn-mode band-sweep fallback re-pad
    if not INTERPRET:
        mode = _vmem_safe_mode(mode, h, w, window_rows)
    rowsel_family = (
        "rowsel", "rowsel3", "rowselm", "rowsel3m", "rowselh", "rowsel3h",
        "rowseld", "rowsel3d", "rowselw", "rowsel3w"
    )
    traced = any(
        isinstance(a, jax.core.Tracer)
        for a in (volume, tables_tx, tables_ty, tables_tz, tables_tc, depths)
    )
    if traced and mode in ("rowselw", "rowsel3w"):
        # Window planning is a host computation (the window length is a
        # static grid extent); under tracing fall back to the plain
        # band-sweep — bit-identical, just without the window skip.
        mode = "rowselh" if mode == "rowselw" else "rowsel3h"
    elif traced and mode in ("rowselm", "rowsel3m", "rowseld", "rowsel3d"):
        # The miss-count failover needs a concrete int(miss) host sync, so
        # any traced input routes to the matching always-exact mode
        # (bit-identical; a jitted caller just loses the fast-path gamble).
        mode = {"rowselm": "rowsel", "rowsel3m": "rowsel3",
                "rowseld": "rowselh", "rowsel3d": "rowsel3h"}[mode]
    if mode in ("rowselh", "rowsel3h", "rowselw", "rowsel3w"):
        # Band-sweep staging: pad the map height to a band multiple.
        bv = _hbm_band_rows(
            w + ((-w) % 128), mode in ("rowsel3h", "rowsel3w"),
            int(window_rows)
        )
        ph, pw = (-h) % bv, (-w) % 128
    elif mode in ("rowseld", "rowsel3d"):
        # Dynamic 2-band staging: >= 2 bands, height a band multiple.
        bv = _dyn_band_rows(w + ((-w) % 128), mode == "rowsel3d")
        ph, pw = max(2 * bv - h, (-h) % bv), (-w) % 128
    else:
        min_h = int(window_rows) if mode in rowsel_family else 8
        ph, pw = max(min_h - h, (-h) % 8), (-w) % 128
    on_device = isinstance(depths, jax.Array)
    if ph or pw:
        pad_fn = jnp.pad if on_device else np.pad
        if not on_device:
            depths = np.asarray(depths)
        depths = pad_fn(
            depths, ((0, 0), (0, ph), (0, pw)), constant_values=-1.0
        )
    hp, wp = h + ph, w + pw
    if mode in ("rowsel3", "rowsel3m", "rowsel3h", "rowsel3d", "rowsel3w"):
        # split_depth_planes dispatches on array type: device inputs split
        # on device (no tunnel round trip).
        depths = split_depth_planes(depths)  # (V, 3, hp, wp)
    n_wr = min(windows[0], hp // 8)
    n_wc = min(windows[1], wp // 128)
    sj = int(subtile_rows)
    # tz transposed to (cz, V, 4) (k-indexed SMEM block); ty to (V, cy, 4)
    # (sublane-aligned jt slicing in the kernel).
    tz_kv = jnp.transpose(jnp.asarray(tables_tz), (2, 0, 1))
    ty_vc = jnp.transpose(jnp.asarray(tables_ty), (0, 2, 1))
    vol_dev = jnp.asarray(volume, jnp.float32)
    args = (jnp.asarray(tables_tx), ty_vc, tz_kv, jnp.asarray(tables_tc),
            jnp.asarray(depths))
    kw = dict(
        h=h, w=w, sj=sj, n_wr=n_wr, n_wc=n_wc,
        thick=float(thick), rho=float(rho),
        eta=float(eta), delta=float(delta),
        wr=int(window_rows), n_k=int(rowsel_passes),
        vb=int(view_block), kz=int(z_block), anchors=str(anchors),
        skip_dead=bool(skip_dead),
    )
    if mode in ("rowselm", "rowsel3m"):
        out, miss = _pallas_integrate_padded_keep(
            vol_dev, *args, mode=mode, **kw
        )
        if int(miss) == 0:
            return out
        return _pallas_integrate_padded(
            vol_dev, *args, mode=mode[:-1], **kw
        )
    if mode in ("rowseld", "rowsel3d"):
        # Dynamic 2-band fast path; any pair outside the two staged bands
        # (pole block / footprint taller than 2*bv) re-dispatches the
        # exact band-sweep mode — bit-identical either way. NOTE the
        # band-sweep pads differently, so fall back through the public
        # entry (it re-pads from the caller's original depths).
        out, miss = _pallas_integrate_padded_keep(
            vol_dev, *args, mode=mode, **kw
        )
        if int(miss) == 0:
            return out
        return pallas_integrate(
            vol_dev, tables_tx, tables_ty, tables_tz, tables_tc,
            depths_orig, thick, rho, eta, delta,
            windows=windows, subtile_rows=subtile_rows,
            mode="rowselh" if mode == "rowseld" else "rowsel3h",
            window_rows=window_rows, rowsel_passes=rowsel_passes,
            view_block=view_block, z_block=z_block, anchors=anchors,
        )
    if mode in ("rowselw", "rowsel3w"):
        # Windowed band-sweep: host-plan the per-unit band windows, run
        # the windowed kernel, and re-dispatch the exact plain sweep if
        # any pair escaped a window (conservative bound violated — never
        # observed; bit-identical in both branches).
        cz, cy, cx = vol_dev.shape
        cy_b = _hbw_y_block(cy, cx, sj)
        an, n_bwin = _window_band_bounds_host(
            np.asarray(tables_tx), np.asarray(ty_vc), np.asarray(tz_kv),
            np.asarray(tables_tc), cy_b=cy_b, bv=bv, hp=hp, h=h,
        )
        out, miss = _pallas_integrate_padded_keep(
            vol_dev, *args, mode=mode,
            band_anchors=jnp.asarray(an), n_bwin=n_bwin, **kw
        )
        if int(miss) == 0:
            return out
        return pallas_integrate(
            vol_dev, tables_tx, tables_ty, tables_tz, tables_tc,
            depths_orig, thick, rho, eta, delta,
            windows=windows, subtile_rows=subtile_rows,
            mode="rowselh" if mode == "rowselw" else "rowsel3h",
            window_rows=window_rows, rowsel_passes=rowsel_passes,
            view_block=view_block, z_block=z_block, anchors=anchors,
        )
    return _pallas_integrate_padded(vol_dev, *args, mode=mode, **kw)


# ---------------------------------------------------------------------------
# Coverage-adaptive pass counts (per orientation group)
# ---------------------------------------------------------------------------

# Cost of one extra row-select pass, expressed in percentage points of
# miss fraction it must recover to break even. The naive v5e ratio is
# ~52 ms per pass-unit step / ~10.3 ms per % missed (docs/KERNEL.md
# coverage sweep) = ~5; the effective value is CALIBRATED to 4.0 so the
# recommendation reproduces the hardware-measured per-size optima of the
# bench rig (k6 @512^3, k8-10 @256^3 where the curve is flat, k4 @1024^3
# where k4==k6 measured) — the walk's fixed per-unit machinery makes
# marginal misses slightly costlier than the linear fit says.
ROWSEL_PASS_COST_PCT = 4.0
ROWSEL_AUTO_K_RANGE = (2, 12)

# Sampled fraction of fully-dead (no-valid-pixel) subtile-views above
# which a group routes through the dead-unit-skipping kernel variant
# (skip_dead='auto'). Measured (v5e, 2026-08-20): the predicated
# structure's cost is workload-shaped — it taxes the 512^3x32 bench ~9%
# (4.89 -> 4.45 G, all units live) yet HELPS 640x480x8 on the same grid
# (+7.5%) even at dead_frac 0 (an RMW-structure effect with no clean
# host predictor; docs/KERNEL.md round-4 "dead-unit skip"). The auto
# route is therefore conservative: only genuinely dead-heavy groups
# (close-ups, frustum-partial rigs), where the first-order saving is
# certain, clear the threshold.
SKIP_DEAD_FRAC = 0.12


def _sample_group_spans(
    tx, ty, tz, tc, czp, cyp, cxp, h, w, sj, wr, n_wc,
    samples_per_view=8, max_views=16, seed=0,
):
    """Host-side (NumPy) replay of the kernel's per-subtile index math on a
    few random subtiles per view of ONE orientation group: returns
    ``(n_valid, span, vi_loc)`` where ``span = vi - rowmin`` and ``vi_loc =
    vi - v0`` for every sampled valid pair — the sufficient statistics for
    the per-group miss fraction at any ``n_k`` under the sampled
    ``(wr, n_wc)`` window geometry. Valid pairs OUTSIDE the anchored
    u-window get sentinel span/vi_loc (never servable): the kernel's
    coverage predicate counts them as remainder work, so dropping them
    would let a wide-u group masquerade as statically covered. The window
    anchors mirror the kernel exactly, including the upper clips
    (``u0 <= wp - 128*n_wc``, ``v0 <= hp - wr``) near the image edges.
    Same math as ``scripts/coverage_sim.py`` (which reproduced the
    hardware-measured full-sweep miss to 0.4%), restricted to what the
    auto-k decision needs. Tables are the group's UNPADDED per-axis tables
    in kernel orientation: tx (G, 4, cxp), ty (G, 4, cyp), tz (G, 4, czp),
    tc (G, 4)."""
    rng = np.random.default_rng(seed)
    g_total = tx.shape[0]
    view_sel = (
        range(g_total)
        if g_total <= max_views
        else rng.choice(g_total, size=max_views, replace=False)
    )
    # Padded map dims, as the kernel pads for the rowsel family
    # (_build_runner: min_h = window_rows); clamp n_wc to the map width
    # the same way the kernel does.
    hp = h + max(int(wr) - h, (-h) % 8)
    wp = w + ((-w) % 128)
    n_wc = min(int(n_wc), wp // 128)
    n_valid = 0
    n_units = 0
    n_dead = 0
    spans, vlocs = [], []
    for vv in view_sel:
        for _ in range(samples_per_view):
            kk = int(rng.integers(czp))
            jt = int(rng.integers(-(-cyp // sj)))
            it = int(rng.integers(-(-cxp // 128)))
            ys = np.arange(jt * sj, (jt + 1) * sj)
            xs = np.arange(it * 128, (it + 1) * 128)
            yv = np.where(ys < cyp, ys, 0)
            xv = np.where(xs < cxp, xs, 0)
            in_grid = (ys < cyp)[:, None] & (xs < cxp)[None, :]
            h0 = tx[vv, 0, xv][None, :] + ty[vv, 0, yv][:, None] + tz[vv, 0, kk] + tc[vv, 0]
            h1 = tx[vv, 1, xv][None, :] + ty[vv, 1, yv][:, None] + tz[vv, 1, kk] + tc[vv, 1]
            h2 = tx[vv, 2, xv][None, :] + ty[vv, 2, yv][:, None] + tz[vv, 2, kk] + tc[vv, 2]
            with np.errstate(divide="ignore", invalid="ignore"):
                u = np.sign(h0 / h2) * np.floor(np.abs(h0 / h2) + 0.5)
                v = np.sign(h1 / h2) * np.floor(np.abs(h1 / h2) + 0.5)
            valid = (
                in_grid & (h2 >= 0)
                & (u >= 0) & (v >= 0) & (u < w) & (v < h)
            )
            nv = int(valid.sum())
            n_units += 1
            if not nv:
                n_dead += 1
                continue
            n_valid += nv
            ui = np.where(valid, u, 0).astype(np.int64)
            vi = np.where(valid, v, 0).astype(np.int64)
            big = 1 << 30
            vm = np.where(valid, vi, big)
            um = np.where(valid, ui, big)
            u0 = min(max(0, (int(um.min()) // 128) * 128),
                     wp - 128 * n_wc)
            rowmin = vm.min(axis=1, keepdims=True)
            v0 = min(max(0, (int(rowmin.min()) // 8) * 8), hp - int(wr))
            in_u = valid & (ui >= u0) & (ui < u0 + 128 * n_wc)
            out_u = valid & ~in_u
            spans.append(np.concatenate([
                (vi - rowmin)[in_u],
                np.full(int(out_u.sum()), big, np.int64),
            ]))
            vlocs.append(np.concatenate([
                (vi - v0)[in_u],
                np.full(int(out_u.sum()), big, np.int64),
            ]))
    dead_frac = n_dead / n_units if n_units else 0.0
    if not spans:
        return 0, np.zeros(0, np.int64), np.zeros(0, np.int64), dead_frac
    return n_valid, np.concatenate(spans), np.concatenate(vlocs), dead_frac


def recommend_rowsel_passes(stats, wr: int) -> int:
    """Per-group pass count from sampled span statistics: the smallest-cost
    ``k`` under the measured model ``cost(k) = PASS_COST * k + miss%(k)``,
    where ``miss%(k)`` counts pairs the k passes inside the wr-row window
    cannot serve. Reproduces the hardware-measured per-size optima of the
    bench rig (k6 @512^3, k8-10 @256^3, k4-6 @1024^3 — docs/KERNEL.md)."""
    n_valid, span, vi_loc = stats[0], stats[1], stats[2]
    lo, hi = ROWSEL_AUTO_K_RANGE
    if n_valid == 0:
        return 6  # no geometry signal; shipping default
    servable = vi_loc < wr
    best_k, best_cost = lo, np.inf
    for k in range(lo, hi + 1):
        miss_pct = 100.0 * float((servable & (span >= k)).sum()) / n_valid
        cost = ROWSEL_PASS_COST_PCT * k + miss_pct
        if cost < best_cost:
            best_k, best_cost = k, cost
    return best_k


# ---------------------------------------------------------------------------
# View-orientation grouping
# ---------------------------------------------------------------------------


def best_axis_permutation(rot_grid: np.ndarray) -> tuple[int, int, int]:
    """Pick (k_axis, sublane_axis, lane_axis) grid-frame axes for one view.

    `rot_grid` is the 3x3 rotation part of RT @ grid_matrix. Row 0 is the
    image-u direction, row 2 the viewing direction (camera-frame axes
    expressed in grid coordinates). Scores all 6 permutations: the lane axis
    should track image-u (keeps u-spans ~128) and the sublane axis the
    viewing direction (keeps perspective-induced v-drift off the lanes).
    """
    u_dir = np.abs(rot_grid[0])
    view_dir = np.abs(rot_grid[2])
    best, best_score = None, -1.0
    for lane in range(3):
        for sub in range(3):
            if sub == lane:
                continue
            k = 3 - lane - sub
            score = u_dir[lane] + view_dir[sub]
            if score > best_score:
                best_score, best = score, (k, sub, lane)
    return best


def group_views_by_orientation(rotations: list[np.ndarray]):
    """Group view indices by their best axis permutation.

    Returns {(k_axis, sublane_axis, lane_axis): [view indices]}.
    """
    groups: dict[tuple[int, int, int], list[int]] = {}
    for i, rot in enumerate(rotations):
        perm = best_axis_permutation(rot)
        groups.setdefault(perm, []).append(i)
    return groups


def _pad_table_invalid(tab: np.ndarray, n_new: int) -> np.ndarray:
    """Pad a (G, 4, n) per-axis table along n. Padded entries poison row 2
    (the homogeneous-z functional) with -1e9, so padded voxels always fail
    the ``hom.z >= 0`` test and never contribute or affect window bounds."""
    g, _, n = tab.shape
    if n_new == n:
        return tab
    pad = np.zeros((g, 4, n_new - n), np.float32)
    pad[:, 2, :] = -1e9
    return np.concatenate([tab, pad], axis=2)


def _pad_views_invalid(tx, ty, tz, tc, depths, g_new: int):
    """Pad the view axis to `g_new` with dummy views whose tc row 2 is -1e9
    (every voxel invalid), bounding the number of jit shape variants."""
    g = tx.shape[0]
    if g_new == g:
        return tx, ty, tz, tc, depths
    e = g_new - g

    def padv(a):
        return np.concatenate([a, np.zeros((e,) + a.shape[1:], a.dtype)], axis=0)

    tc_pad = np.zeros((e, 4), np.float32)
    tc_pad[:, 2] = -1e9
    return (
        padv(np.asarray(tx)), padv(np.asarray(ty)), padv(np.asarray(tz)),
        np.concatenate([np.asarray(tc), tc_pad], axis=0),
        np.concatenate(
            [np.asarray(depths), np.full((e,) + depths.shape[1:], -1.0, depths.dtype)],
            axis=0,
        ),
    )


class OrientedFusionPlan:
    """Pre-staged, orientation-grouped fusion work for one batch of views.

    Splits staging (host table/depth prep + device upload — done ONCE per
    batch of views) from execution (the per-group Pallas calls — can run many
    times, e.g. for benchmarking or replays). Groups are padded to a multiple
    of `view_pad_multiple` dummy views to bound jit shape variants.
    """

    def __init__(
        self,
        grid,
        views,
        params,
        threshold_best_cost: float | None = None,
        view_pad_multiple: int = 8,
        subtile_rows: int = 16,
        transpose_maps: bool = False,
    ):
        """transpose_maps: serve every depth map TRANSPOSED (an h x w map
        becomes w x h), by swapping the u/v rows of the projection tables
        and transposing the staged depth arrays. The kernel then gathers
        depth.T[v', u'] with (u', v') = (v, u) — the same pixel value,
        same validity mask, same camera-z — so the math is exact by
        construction (the XLA integrator is BIT-identical under this
        transform); only the kernel's band/lane geometry changes (bands
        then cut the long image axis, e.g. 1080 lanes x 1920 band rows
        for HD). Orientation grouping scores the transposed u direction
        (rotation row 1), so the chosen axis permutation usually changes —
        and with it the LAYOUT-order association of the separable sum
        ``t_k + t_j + t_i + tc``, the same ±1-ulp fp regrouping as axis
        relabeling (docs/PARITY.md round-3 section). Expect ulp-level
        value differences in the linear-ramp region and half-pixel
        rounding flips on knife-edge lattices, identical to switching
        `shard_axis`; gated vs the fp64 oracle like every other config.
        A structural lever for wide maps whose in-layout knobs measured
        flat (docs/KERNEL.md round-4 HD floor)."""
        from ..ops.integrate import projection_tables

        if threshold_best_cost is not None:
            views = [v.thresholded(threshold_best_cost) for v in views]
        self.params = params
        self.subtile_rows = int(subtile_rows)
        # Miss count of the last miss-tracking run() (None before one).
        self.last_miss: int | None = None
        # Per-group pass counts of the last-built runner (ints; filled by
        # _build_runner — the interesting case is rowsel_passes='auto').
        self.group_passes: list[int] = []
        # Per-group miss counts of the last per_group_redispatch run().
        self.last_group_miss: list[int] = []
        self._h, self._w = (int(views[0].depth.shape[0]),
                            int(views[0].depth.shape[1]))
        self._runners: dict = {}
        # Staged (tables + padded/split depth) device arrays, shared across
        # runner variants that only differ in tunables/miss-tracking —
        # keyed by (ph, pw, split3). Avoids re-padding/re-splitting and
        # re-uploading ~100 MB of depth planes when e.g. a rowsel3m miss
        # re-dispatches the rowsel3 runner.
        self._staged_cache: dict = {}
        tables = projection_tables(grid, views, np.float32)
        rots = [(v.camera.rt @ grid.matrix)[:3, :3] for v in views]
        depths_all = np.stack([v.depth for v in views]).astype(np.float32)
        if transpose_maps:
            # Swap the u/v functional rows (0 <-> 1) of every table,
            # transpose the depth maps, swap the map dims, and score
            # orientation on the swapped rotation (image-u is now the old
            # image-v direction, rotation row 1).
            swap = np.array([1, 0, 2, 3])
            tables = type(tables)(
                tx=tables.tx[:, swap], ty=tables.ty[:, swap],
                tz=tables.tz[:, swap], tc=tables.tc[:, swap],
            )
            depths_all = np.ascontiguousarray(depths_all.transpose(0, 2, 1))
            self._h, self._w = self._w, self._h
            rots = [r[np.array([1, 0, 2])] for r in rots]
        axis_tables = {0: tables.tx, 1: tables.ty, 2: tables.tz}
        groups = group_views_by_orientation(rots)

        cz, cy, cx = grid.volume_shape
        self.groups = []
        for perm, idxs in sorted(groups.items()):
            k_ax, s_ax, l_ax = perm
            order = (2 - k_ax, 2 - s_ax, 2 - l_ax)
            inv = tuple(int(a) for a in np.argsort(order))
            dims_p = [(cz, cy, cx)[o] for o in order]
            czp, cyp, cxp = dims_p
            py, px = (-cyp) % self.subtile_rows, (-cxp) % 128
            sel = np.asarray(idxs)
            g_new = -(-len(sel) // view_pad_multiple) * view_pad_multiple
            tx, ty, tz, tc, depths = _pad_views_invalid(
                _pad_table_invalid(axis_tables[l_ax][sel], cxp + px),
                _pad_table_invalid(axis_tables[s_ax][sel], cyp + py),
                axis_tables[k_ax][sel],
                tables.tc[sel],
                depths_all[sel],
                g_new,
            )
            self.groups.append(
                dict(
                    order=order,
                    inv=inv,
                    pad=(py, px),
                    cyp=cyp,
                    cxp=cxp,
                    # Unpadded host tables retained for the lazy auto-k
                    # span sampling (rowsel_passes='auto'); a few hundred
                    # KB per group.
                    stat_tables=(
                        axis_tables[l_ax][sel], axis_tables[s_ax][sel],
                        axis_tables[k_ax][sel], tables.tc[sel], czp,
                    ),
                    span_stats=None,
                    tx=jnp.asarray(tx),
                    ty=jnp.asarray(ty),
                    tz=jnp.asarray(tz),
                    tc=jnp.asarray(tc),
                    # host-side: padded/split + uploaded per staged_key in
                    # _build_runner (uploading the unpadded maps here would
                    # just be downloaded again at staging time)
                    depths=depths,
                )
            )

    def _span_stats(self, gi: int, wr: int, n_wc: int):
        """Lazily-sampled span statistics for orientation group ``gi``
        under the ``(wr, n_wc)`` window geometry (cached per geometry;
        see :func:`_sample_group_spans`)."""
        g = self.groups[gi]
        if g["span_stats"] is None:
            g["span_stats"] = {}
        key = (int(wr), int(n_wc))
        if key not in g["span_stats"]:
            tx_u, ty_u, tz_u, tc_u, czp = g["stat_tables"]
            g["span_stats"][key] = _sample_group_spans(
                tx_u, ty_u, tz_u, tc_u,
                czp, g["cyp"], g["cxp"], self._h, self._w,
                self.subtile_rows, wr=int(wr), n_wc=int(n_wc), seed=gi,
            )
        return g["span_stats"][key]

    def _kernel_n_wc(self, windows) -> int:
        """The column-window count the kernel will actually use for this
        plan's depth maps (mirrors _build_runner's clamp)."""
        wp = self._w + ((-self._w) % 128)
        return min(int(windows[1]), wp // 128)

    def _group_passes(self, rowsel_passes, window_rows, n_wc=2):
        """Per-group pass counts: `rowsel_passes` verbatim for ints, or the
        coverage-adaptive recommendation per orientation group for 'auto'
        (host-computable tilt -> pass count; see recommend_rowsel_passes).
        The chosen counts are exposed as ``self.group_passes`` after a
        runner is built."""
        if rowsel_passes != "auto":
            return [int(rowsel_passes)] * len(self.groups)
        return [
            recommend_rowsel_passes(
                self._span_stats(gi, int(window_rows), n_wc),
                int(window_rows),
            )
            for gi in range(len(self.groups))
        ]

    def _statically_covered_groups(self, rowsel_passes, window_rows,
                                   n_wc=2, min_samples: int = 5000):
        """Group indices whose SAMPLED span statistics show the static
        passes covering every valid pair (zero expected remainder work):
        candidates for the tracked no-remainder fast path, whose measured
        rate is ~3x the inline kernel (fast-path 14.4 G vs inline 4.9 G
        @512^3x32 k2, docs/KERNEL.md coverage sweep). The sample is an
        ESTIMATE — callers must keep the exact per-group fallback."""
        ks = self._group_passes(rowsel_passes, window_rows, n_wc)
        out = []
        for gi in range(len(self.groups)):
            n_valid, span, vloc = self._span_stats(
                gi, int(window_rows), n_wc
            )[:3]
            if n_valid < min_samples:
                continue
            servable = vloc < int(window_rows)
            miss = int((~servable).sum()) + int(
                (servable & (span >= ks[gi])).sum()
            )
            if miss == 0:
                out.append(gi)
        return out

    def _build_runner(self, windows, mode, window_rows, rowsel_passes,
                      view_block, z_block, anchors, skip_dead=False,
                      group_index=None):
        """One jitted chain over ALL groups: transpose -> pad -> kernel ->
        unpad -> inverse transpose per group, fused into a single dispatch
        (the round-1 plan issued ~4 eager dispatches per group per batch —
        real latency on a high-RTT control plane, and the depth re-pad was
        a device->host round trip per call). Tables/depths are staged in
        kernel layout ONCE here.

        ``group_index``: chain only that single orientation group (the
        per-group miss re-dispatch path of :meth:`run` — each group can
        then fail over to its exact kernel independently)."""
        h, w = self._h, self._w
        rowsel_family = (
            "rowsel", "rowsel3", "rowselm", "rowsel3m", "rowselh", "rowsel3h"
        )
        if not INTERPRET:
            mode = _vmem_safe_mode(mode, h, w, window_rows)
        if mode in ("rowselh", "rowsel3h", "rowselw", "rowsel3w"):
            bv = _hbm_band_rows(
                w + ((-w) % 128), mode in ("rowsel3h", "rowsel3w"),
                int(window_rows)
            )
            ph, pw = (-h) % bv, (-w) % 128
        elif mode in ("rowseld", "rowsel3d"):
            bv = _dyn_band_rows(w + ((-w) % 128), mode == "rowsel3d")
            ph, pw = max(2 * bv - h, (-h) % bv), (-w) % 128
        else:
            min_h = window_rows if mode in rowsel_family else 8
            ph, pw = max(min_h - h, (-h) % 8), (-w) % 128
        hp, wp = h + ph, w + pw
        n_wr = min(windows[0], hp // 8)
        n_wc = min(windows[1], wp // 128)
        sj = self.subtile_rows
        p = self.params
        # Modes whose impl returns (volume, miss): the diagnostics AND the
        # dynamic/windowed band fast paths (whose miss triggers the
        # band-sweep fallback in run()).
        track_miss = mode in ("rowselm", "rowsel3m", "rowseld", "rowsel3d",
                              "rowselw", "rowsel3w")
        split3 = mode in ("rowsel3", "rowsel3m", "rowsel3h", "rowsel3d",
                          "rowsel3w")
        staged_key = (ph, pw, split3)
        staged = self._staged_cache.get(staged_key)
        if staged is None:
            staged = []
            for g in self.groups:
                # Upload the RAW depth maps once per plan (cached per
                # group); pad + 3-plane split run ON DEVICE, so a staged
                # (ph, pw, split3) variant costs no additional host-link
                # bytes (the round-2..4 path padded/split on host and
                # uploaded up to 3x the raw bytes per variant). The device
                # split is exact — optimization_barrier'd, pinned by
                # test_split_depth_planes_device_matches_host.
                d = g.get("depths_dev")
                if d is None:
                    d = g["depths_dev"] = jnp.asarray(g["depths"])
                if ph or pw:
                    d = jnp.pad(
                        d, ((0, 0), (0, ph), (0, pw)), constant_values=-1.0
                    )
                if split3:
                    d = split_depth_planes(d)  # (G, 3, hp, wp)
                staged.append(
                    (
                        g["tx"],
                        jnp.transpose(g["ty"], (0, 2, 1)),
                        jnp.transpose(g["tz"], (2, 0, 1)),
                        g["tc"],
                        d,
                    )
                )
            self._staged_cache[staged_key] = staged
        metas = [
            (g["order"], g["inv"], g["pad"], g["cyp"], g["cxp"])
            for g in self.groups
        ]
        group_ks = self._group_passes(rowsel_passes, window_rows, n_wc)
        self.group_passes = list(group_ks)
        # Per-group dead-unit-skip routing (v2 modes only): 'auto' turns
        # the skipping kernel variant on for groups whose SAMPLED dead
        # fraction clears SKIP_DEAD_FRAC (the measured breakeven of the
        # predicated structure's ~9% live-unit tax); True/False force it.
        if skip_dead == "auto" and mode in ("rowsel", "rowsel3",
                                            "rowselm", "rowsel3m"):
            # EFFECTIVE dead fraction = view-padding steps (dummy views
            # are 100% dead, and the sampler only sees REAL views) plus
            # the sampled in-view dead fraction. The round-4 view-count
            # probe decoded exactly this: groups of 4 real + 4 pad views
            # gain +25.7% from the skip, 25% pad gains ~+4.5%, unpadded
            # groups lose ~9% — monotone in effective deadness
            # (docs/KERNEL.md round-4 "dead-unit skip").
            group_skip = []
            for gi, g in enumerate(self.groups):
                real = g["stat_tables"][0].shape[0]
                padded = g["tx"].shape[0]
                pad_frac = 1.0 - real / max(padded, 1)
                sampled = self._span_stats(gi, int(window_rows), n_wc)[3]
                eff = pad_frac + (1.0 - pad_frac) * sampled
                group_skip.append(eff >= SKIP_DEAD_FRAC)
        else:
            group_skip = [bool(skip_dead is True)] * len(self.groups)
        self.group_skip_dead = list(group_skip)
        if mode in ("rowselw", "rowsel3w"):
            # Host-plan each group's band windows from its STAGED kernel-
            # layout tables (concrete at build time). Each group gets its
            # own static window length; anchors ride the staged pytree.
            bv = _hbm_band_rows(wp, split3, min(window_rows, hp))
            wins = []
            for arrs in staged:
                gtx, gty, gtz, gtc = arrs[0], arrs[1], arrs[2], arrs[3]
                cy_g, cx_g = gty.shape[1], gtx.shape[2]
                cy_b_g = _hbw_y_block(cy_g, cx_g, sj)
                wins.append(_window_band_bounds_host(
                    np.asarray(gtx), np.asarray(gty), np.asarray(gtz),
                    np.asarray(gtc), cy_b=cy_b_g, bv=bv, hp=hp, h=h,
                ))
            staged = [arrs + (jnp.asarray(an),)
                      for arrs, (an, _) in zip(staged, wins)]
            group_nbw = [nbw for _, nbw in wins]
            # Probe/diagnostic record: per-group (window bands, map bands).
            self.group_band_windows = [
                (nbw, hp // bv) for nbw in group_nbw
            ]
        else:
            group_nbw = [0] * len(staged)
        if group_index is not None:
            gsel = slice(group_index, group_index + 1)
            staged = staged[gsel]
            metas = metas[gsel]
            group_ks = group_ks[gsel]
            group_nbw = group_nbw[gsel]
            group_skip = group_skip[gsel]

        def chain(vol, staged_arrays):
            miss_total = jnp.float32(0)
            for (order, inv, (py, px), cyp, cxp), arrs, n_k_g, nbw_g, \
                    skip_g in zip(
                metas, staged_arrays, group_ks, group_nbw, group_skip
            ):
                tx, ty, tz, tc, depths = arrs[:5]
                an_g = arrs[5] if len(arrs) > 5 else None
                volp = jnp.transpose(vol, order)
                if py or px:
                    volp = jnp.pad(volp, ((0, 0), (0, py), (0, px)))
                out = _pallas_integrate_impl(
                    volp, tx, ty, tz, tc, depths,
                    h=h, w=w, sj=sj, n_wr=n_wr, n_wc=n_wc,
                    thick=float(p.thick), rho=float(p.rho),
                    eta=float(p.eta), delta=float(p.delta),
                    mode=mode, wr=min(window_rows, hp), n_k=n_k_g,
                    vb=view_block, kz=z_block, anchors=anchors,
                    band_anchors=an_g, n_bwin=nbw_g, skip_dead=skip_g,
                )
                if track_miss:
                    out, miss = out
                    miss_total = miss_total + miss
                vol = jnp.transpose(out[:, :cyp, :cxp], inv)
            return (vol, miss_total) if track_miss else vol

        # Miss-tracking runners keep the caller's volume alive for the
        # exact re-dispatch on a miss (see run()); exact runners donate.
        jitted = jax.jit(chain, donate_argnums=() if track_miss else (0,))
        return lambda vol: jitted(vol, staged)

    def run(
        self,
        volume_zyx,
        windows: tuple[int, int] = (3, 2),
        mode: str = "rowsel",
        window_rows: int = 32,
        rowsel_passes: int | str = 2,
        view_block: int = 1,
        z_block: int = 1,
        anchors: str = "exact",
        per_group_redispatch: bool = False,
        fast_groups: bool | str = False,
        skip_dead: bool | str = "auto",
    ):
        """Fuse the planned views into (cz, cy, cx) `volume_zyx`.

        The input volume buffer is DONATED when already on device (pass a
        fresh array or host data per call). Miss-tracking modes
        ('rowselm'/'rowsel3m') hold one extra volume buffer and re-dispatch
        the matching exact mode when any voxel escaped the static passes
        (count exposed as ``self.last_miss``) — output is bit-identical to
        the exact mode either way. ``per_group_redispatch=True`` scopes
        that failover to each orientation group (one host sync per group;
        per-group misses in ``self.last_group_miss``): statically-covered
        groups keep their fast pass even when another group misses.

        rowsel_passes='auto': per-ORIENTATION-GROUP pass counts from the
        sampled span statistics (tilt is a per-view host-computable
        quantity, so a mixed rig gets e.g. k2 for its axis-aligned
        top-down groups and k6 for its oblique orbit groups instead of
        one global knob; chosen counts in ``self.group_passes``).
        Bit-identical to any fixed count — passes affect speed, never
        values.

        fast_groups='auto' (exact modes only): groups whose sampled span
        statistics show the static passes covering EVERY pair — e.g. a
        straight-down mapping scan, measured 0.00% miss — run the
        tracked NO-REMAINDER kernel (~3x the inline rate) with the exact
        kernel as an automatic per-group fallback on any actual miss.
        Groups with expected remainder work stay on the inline kernel.
        Output is bit-identical in all branches; worst case (the sample
        lied) pays one wasted fast pass for that group only.

        skip_dead='auto' (default): groups whose sampled fraction of
        fully-dead subtile-views (no valid pixel — frustum-partial
        views, close-ups) clears SKIP_DEAD_FRAC route through the
        dead-unit-skipping kernel variant (one any-reduction guards the
        whole unit); fully-live groups keep the unpredicated kernel
        (the predicated structure taxes live units ~9%, measured).
        Bit-identical either way; chosen flags in
        ``self.group_skip_dead``."""

        def get_runner(key, group_index=None):
            full_key = key + (group_index,)
            runner = self._runners.get(full_key)
            if runner is None:
                runner = self._runners[full_key] = self._build_runner(
                    *key, group_index=group_index
                )
            return runner

        key = (
            tuple(windows), mode, int(window_rows),
            rowsel_passes if rowsel_passes == "auto" else int(rowsel_passes),
            int(view_block), int(z_block), str(anchors),
            skip_dead if skip_dead == "auto" else bool(skip_dead),
        )
        vol = jnp.asarray(volume_zyx, jnp.float32)
        # Reset per run: stale per-group miss counts from a previous call
        # must not leak into paths that never populate them.
        self.last_group_miss = []
        if fast_groups and mode in ("rowsel", "rowsel3"):
            tracked_viable = INTERPRET or _fast_groups_viable(
                mode, self._h, self._w, int(window_rows)
            )
            fast = set(
                self._statically_covered_groups(
                    rowsel_passes, window_rows, self._kernel_n_wc(windows)
                )
            ) if tracked_viable else set()
            if fast:
                # Sequential per-group chain in meta order — the same
                # group order as the single fused runner, so results are
                # bit-identical to it; fast groups sync one miss count.
                tracked_key = (key[0], mode + "m") + key[2:]
                self.last_group_miss = []
                for gi in range(len(self.groups)):
                    if gi in fast:
                        out, miss = get_runner(tracked_key, gi)(vol)
                        m = int(miss)
                        self.last_group_miss.append(m)
                        vol = out if m == 0 else get_runner(key, gi)(vol)
                    else:
                        self.last_group_miss.append(-1)  # inline exact
                        vol = get_runner(key, gi)(vol)
                self.last_miss = sum(m for m in self.last_group_miss
                                     if m > 0)
                return vol
            return get_runner(key)(vol)
        if mode in ("rowseld", "rowsel3d", "rowselw", "rowsel3w"):
            # Dynamic 2-band / windowed band-sweep fast paths: any pair
            # outside the staged bands re-dispatches the exact band-sweep
            # mode (bit-identical either way; the tracked runner keeps the
            # input alive).
            out, miss = get_runner(key)(vol)
            self.last_miss = int(miss)
            if self.last_miss == 0:
                return out
            fb_key = (
                key[0],
                "rowselh" if mode in ("rowseld", "rowselw") else "rowsel3h",
            ) + key[2:]
            return get_runner(fb_key)(vol)
        if mode in ("rowselm", "rowsel3m"):
            if per_group_redispatch:
                # Each group runs the no-remainder fast kernel; ONLY groups
                # that actually missed re-run their exact kernel — a miss
                # in one group no longer wastes every other group's fast
                # pass (whole-sweep re-dispatch measured 1278 vs 1015 ms
                # inline @512^3x32 BECAUSE any miss re-ran everything).
                # Costs one host sync (the miss count) per group.
                exact_key = (key[0], mode[:-1]) + key[2:]
                self.last_group_miss = []
                for gi in range(len(self.groups)):
                    out, miss = get_runner(key, gi)(vol)
                    m = int(miss)
                    self.last_group_miss.append(m)
                    vol = out if m == 0 else get_runner(exact_key, gi)(vol)
                self.last_miss = sum(self.last_group_miss)
                return vol
            out, miss = get_runner(key)(vol)
            self.last_miss = int(miss)
            if self.last_miss == 0:
                return out
            exact_key = (key[0], mode[:-1]) + key[2:]  # anchors rides along
            return get_runner(exact_key)(vol)
        return get_runner(key)(vol)


def integrate_views_oriented(
    volume_zyx,
    grid,
    views,
    params,
    threshold_best_cost: float | None = None,
    windows: tuple[int, int] = (3, 2),
    view_pad_multiple: int = 8,
    subtile_rows: int = 16,
    mode: str = "rowsel",
    window_rows: int = 32,
    rowsel_passes: int | str = 2,
    view_block: int = 1,
    z_block: int = 1,
    anchors: str = "exact",
    skip_dead: bool | str = "auto",
    transpose_maps: bool = False,
):
    """High-level Pallas fusion: orientation-grouped, per-subtile adaptive.
    ``rowsel_passes='auto'`` picks per-orientation-group pass counts (see
    :meth:`OrientedFusionPlan.run`); ``transpose_maps`` serves the depth
    maps transposed (see :class:`OrientedFusionPlan`).

    volume_zyx: (cz, cy, cx) array (canonical z, y, x layout, unpadded).
    Returns the updated (cz, cy, cx) jax array.
    """
    plan = OrientedFusionPlan(
        grid, views, params,
        threshold_best_cost=threshold_best_cost,
        view_pad_multiple=view_pad_multiple,
        subtile_rows=subtile_rows,
        transpose_maps=transpose_maps,
    )
    return plan.run(
        volume_zyx, windows=windows, mode=mode,
        window_rows=window_rows, rowsel_passes=rowsel_passes,
        view_block=view_block, z_block=z_block, anchors=anchors,
        skip_dead=skip_dead,
    )
