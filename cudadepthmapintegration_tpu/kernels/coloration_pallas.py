"""Pallas TPU kernel for mesh-coloration color sampling.

Replaces the gather stage of ``MeshColoration::ProcessColoration``
(``Coloration/MeshColoration.cxx:150-170``) — the XLA ``take_along_axis``
path runs ~0.1 G elem/s on TPU (docs/KERNEL.md), which dominates
capstone-scale colorization. Design:

* **RGB as THREE bf16-exact fp32 planes** (r, g, b, each uint8-valued):
  the rowsel machinery selects rows with a 0/1 MXU matmul; uint8 values
  have <= 8 significant bits, so each plane's select dot runs at
  ``Precision.DEFAULT`` — ONE exact MXU pass per plane (3 total,
  measured bit-exact on hardware by the round-2.5 split-plane work in
  ``integrate_pallas``), vs the earlier two packed <=2^16 planes whose
  HIGHEST dots cost ~6 passes each. (History: a 24-bit packed
  ``r*65536+g*256+b`` single plane came back with corrupted low bits at
  HIGHEST in round 2 — unresolved, and in tension with the later
  measurement that HIGHEST selects full fp32 depth bit-exactly; packed
  INTEGER planes stay conservatively < 2^16, see
  ``integrate_pallas._rowsel_pass``.) All planes share one set of index
  reductions, selectors, and remainder walks
  (``integrate_pallas._gather_pixels_multi``), so a plane costs one dot +
  one lane-gather per window pass, not a kernel.
* **Vertex tiles**: marching-cubes output order is raster-coherent (welded
  vertices sort by global edge key), so consecutive (sj, 128) vertex tiles
  have compact image footprints, exactly like voxel subtiles.
* **Grid (tile-blocks, V)** — ``tile_block`` tiles share one grid step
  (one fori_loop in-kernel), and the three channel planes ride ONE
  stacked (V, 3, hp, wp) array (one input DMA per step; samples leave as
  one stacked output). The kernel emits per-channel SAMPLES per
  (vertex, view) (invalid -> -1.0); mean / exact masked median / count
  are computed from the sample buffer downstream (``ops/coloration.py``)
  — no XLA image gathers anywhere.

Parity quirks preserved: projection with NO ``hom.z < 0`` rejection and no
occlusion test (``ReconstructionData.cxx:169-182``), half-away rounding,
view-0-dims bounds test; ``z_test=True`` opts into the corrected behavior.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from . import integrate_pallas as _ip
from .integrate_pallas import _gather_pixels_multi, _round_half_away

__all__ = [
    "gather_colors_pallas",
    "stage_color_planes",
    "stage_point_tiles",
    "StagedColorPlanes",
]


def _morton_order(points: np.ndarray) -> np.ndarray:
    """Permutation sorting points by 30-bit 3-D Morton code over their bbox.

    Consecutive vertices then form compact SURFACE PATCHES (not thin raster
    slabs), so every (sj, 128) kernel tile projects to a small image window
    under ANY camera — the worst-case remainder walk cost drops from
    O(image) to O(patch footprint). Exactness is unaffected: samples are
    inverse-permuted on the way out."""
    lo = points.min(axis=0)
    span = np.maximum(points.max(axis=0) - lo, 1e-12)
    q = np.minimum(
        ((points - lo) / span * 1024.0).astype(np.uint64), 1023
    )

    def spread(x):  # interleave 10 bits with 2-bit gaps
        x = (x | (x << 16)) & np.uint64(0x030000FF)
        x = (x | (x << 8)) & np.uint64(0x0300F00F)
        x = (x | (x << 4)) & np.uint64(0x030C30C3)
        x = (x | (x << 2)) & np.uint64(0x09249249)
        return x

    code = spread(q[:, 0]) | (spread(q[:, 1]) << 1) | (spread(q[:, 2]) << 2)
    return np.argsort(code, kind="stable")


def _colorize_kernel(
    pts_ref,  # (1, tb*3*sj, 128) vertex coords: per tile, sj rows x/y/z
    proj_ref,  # (V, 12) SMEM: rows of K4@RT (3, 4) flattened
    planes_ref,  # (vb, 3, hp, wp) r/g/b planes (uint8-valued f32), one DMA
    out_ref,  # (1, vb, 3, tb*sj, 128) r/g/b samples per (tile-block, view)
    *, h, w, hp, wp, sj, tb, wr, n_wc, n_k, z_test, probe=0,
    static_tiles=False,
):
    # vb views share one grid step (the integrate kernel's view_block
    # trick): the per-step fixed cost — measured as ~96% of the kernel
    # once the remainder machinery is gone, the round-2.6 "structural
    # floor" — amortizes over vb (view, tile-block) units.
    vb = planes_ref.shape[0]
    view0 = pl.program_id(1) * vb

    # tb tiles share one grid step: the ~3*hp*wp*4-byte plane DMA and the
    # per-step fixed cost amortize over tb subtiles (measured 12 us/step at
    # tb=1 vs ~1.7 us/subtile in the integrate kernel, whose grid steps
    # carry 32 subtiles). All row offsets are multiples of sj (>= 8).
    # Per-view projection scalars and plane ref views are tile-invariant:
    # read SMEM once per view OUTSIDE the tile loop, not per fori
    # iteration (Mosaic does not hoist them). Skipped for probe>=4 so the
    # floor probes keep measuring a bare loop body.
    if probe < 4:
        planes_by_view = [
            tuple(planes_ref.at[vv, i] for i in range(3)) for vv in range(vb)
        ]
        pcs = [
            [proj_ref[view0 + vv, i] for i in range(12)] for vv in range(vb)
        ]

    def view_tile_body(vv, t):
        if probe < 4:
            planes = planes_by_view[vv]
            pc = pcs[vv]
        if probe >= 4:
            # probe=4: static addressing only (loads/stores slot 0,
            # constant samples) — isolates the dynamic-ds + arithmetic
            # cost; probe=5: loop body reduced to one static store.
            if probe == 4:
                xs = pts_ref[0, 0:sj, :]
                for i in range(3):
                    out_ref[0, 0, i, 0:sj, :] = xs
            return
        base = t * 3 * sj
        xs = pts_ref[0, pl.ds(base, sj), :]
        ys = pts_ref[0, pl.ds(base + sj, sj), :]
        zs = pts_ref[0, pl.ds(base + 2 * sj, sj), :]
        if probe == 3:
            # probe=3: dynamic loads/stores, no projection/gather math.
            for i, smp in enumerate((xs, ys, zs)):
                out_ref[0, vv, i, pl.ds(t * sj, sj), :] = smp
            return

        def hom(r):
            return (
                pc[4 * r + 0] * xs
                + pc[4 * r + 1] * ys
                + pc[4 * r + 2] * zs
                + pc[4 * r + 3]
            )

        h0, h1, h2 = hom(0), hom(1), hom(2)
        u = _round_half_away(h0 / h2)
        v = _round_half_away(h1 / h2)
        # Reference quirk: NO hom.z < 0 rejection
        # (ReconstructionData.cxx:169-182).
        valid = (u >= 0) & (v >= 0) & (u < w) & (v < h)
        if z_test:
            valid &= h2 > 0
        ui = jnp.where(valid, u, 0.0).astype(jnp.int32)
        vi = jnp.where(valid, v, 0.0).astype(jnp.int32)
        # probe: TIMING-ONLY ablations (wrong values, cost attribution —
        # mirrors scripts/tpu_ablate_kernel.py for the integrate kernel).
        # 1 = skip the remainder machinery+walks; 2 = skip gathers too.
        if probe == 2:
            samples = (h0, h1, h2)
        elif probe == 1:
            samples, _cov = _gather_pixels_multi(
                planes, ui, vi, valid,
                hp=hp, wp=wp, wr=wr, n_wc=n_wc, n_k=n_k,
                precisions=(jax.lax.Precision.DEFAULT,) * 3,
                fallback=False,
            )
        else:
            samples = _gather_pixels_multi(
                planes, ui, vi, valid,
                hp=hp, wp=wp, wr=wr, n_wc=n_wc, n_k=n_k,
                precisions=(jax.lax.Precision.DEFAULT,) * 3,
            )
        for i, smp in enumerate(samples):
            out_ref[0, vv, i, pl.ds(t * sj, sj), :] = jnp.where(
                valid, smp, -1.0
            )

    def tile_body(t, _):
        for vv in range(vb):
            view_tile_body(vv, t)
        return 0

    if static_tiles:
        # Static unroll: every slice offset is a compile-time constant
        # (tb x the code size; probe knob for the dynamic-ds cost).
        for t_ in range(tb):
            tile_body(t_, 0)
    else:
        jax.lax.fori_loop(0, tb, tile_body, 0)


@functools.partial(
    jax.jit,
    static_argnames=(
        "h", "w", "sj", "tb", "vb", "wr", "n_wc", "n_k", "z_test", "probe",
        "static_tiles",
    ),
)
def _gather_colors_padded(
    pts, proj, planes, *, h, w, sj, tb, wr, n_wc, n_k, z_test, vb=1, probe=0,
    static_tiles=False,
):
    ntb = pts.shape[0]  # number of tile-BLOCKS (tb tiles each)
    nv, _three, hp, wp = planes.shape
    vb = max(1, int(vb))
    while nv % vb:
        vb -= 1
    kernel = functools.partial(
        _colorize_kernel,
        h=h, w=w, hp=hp, wp=wp, sj=sj, tb=tb, wr=wr, n_wc=n_wc, n_k=n_k,
        z_test=z_test, probe=probe, static_tiles=static_tiles,
    )
    samp = jax.ShapeDtypeStruct((ntb, nv, 3, tb * sj, 128), jnp.float32)
    samp_spec = pl.BlockSpec(
        (1, vb, 3, tb * sj, 128), lambda t, v: (t, v, 0, 0, 0),
        memory_space=pltpu.VMEM,
    )
    plane_spec = pl.BlockSpec(
        (vb, 3, hp, wp), lambda t, v: (v, 0, 0, 0), memory_space=pltpu.VMEM
    )
    return pl.pallas_call(
        kernel,
        out_shape=samp,
        grid=(ntb, nv // vb),
        in_specs=[
            pl.BlockSpec((1, tb * 3 * sj, 128), lambda t, v: (t, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((nv, 12), lambda t, v: (0, 0),
                         memory_space=pltpu.SMEM),
            plane_spec,
        ],
        out_specs=samp_spec,
        interpret=_ip.INTERPRET,
    )(pts, proj, planes)


class StagedColorPlanes:
    """Device-resident (V, 3, hp, wp) r/g/b planes of one view batch (see
    :func:`stage_color_planes`). Staging is the expensive part of a gather
    call (uint8->f32 expansion + host->device upload of V*hp*wp*12 bytes);
    callers that gather the same views repeatedly (point chunking in
    ``ops/coloration.colorize_points``, benchmarking) stage once. One
    stacked array = ONE input DMA per grid step in the kernel."""

    def __init__(self, planes, h, w):
        self.planes = planes  # (V, 3, hp, wp) f32 on device
        self.h, self.w = int(h), int(w)

    @property
    def nbytes(self) -> int:
        return self.planes.size * 4


def stage_color_planes(
    colors: np.ndarray,  # (V, h, w, 3) uint8
    window_rows: int = 32,
) -> StagedColorPlanes:
    """Split uint8 RGB into (V, 3, hp, wp) padded fp32 planes on device.

    ``window_rows`` only sets the MINIMUM padded height (a staged batch can
    be gathered with any wr <= hp)."""
    nv, hgt, wid = colors.shape[:3]
    c = colors.astype(np.float32).transpose(0, 3, 1, 2)  # (V, 3, h, w)
    ph = max(window_rows - hgt, (-hgt) % 8)
    pw = (-wid) % 128
    if ph or pw:
        c = np.pad(
            c, ((0, 0), (0, 0), (0, ph), (0, pw)), constant_values=-1.0
        )
    return StagedColorPlanes(jnp.asarray(c), hgt, wid)


def stage_point_tiles(points: np.ndarray, sj: int, tile_block: int):
    """Pack (N, 3) f32 points into the kernel's tiled operand layout
    (ntb, tb*3*sj, 128): per tile, sj rows of x, then y, then z.

    The tile count is rounded up to a multiple of ``tile_block`` (tb tiles
    share one grid step, amortizing the per-step plane DMA + fixed cost
    that dominates at tb=1 — measured 12 us/step vs ~4 us of gather work).
    Padded vertices sit at the origin; they may gather real pixels but the
    caller slices them away — only the last tile's footprint bbox sees
    them. Returns ``(pts_t device array, nt)``. The SINGLE source of this
    layout — reused by bench.py so a kernel layout change cannot silently
    desynchronize the benchmark's operands.
    """
    n = points.shape[0]
    tile = sj * 128
    tb = max(1, int(tile_block))
    pad_n = (-n) % (tile * tb)
    pts = np.zeros((n + pad_n, 3), np.float32)
    pts[:n] = points
    nt = (n + pad_n) // tile
    ntb = nt // tb
    pts_t = (
        pts.reshape(nt, sj, 128, 3)
        .transpose(0, 3, 1, 2)
        .reshape(ntb, tb * 3 * sj, 128)
    )
    return jnp.asarray(pts_t), nt


def gather_colors_pallas(
    points: np.ndarray,  # (N, 3) world vertices (mesh order: raster-coherent)
    proj: np.ndarray,  # (V, 3, 4) rows of K4 @ RT, f32
    colors,  # (V, h, w, 3) uint8, or a StagedColorPlanes
    z_test: bool = False,
    sj: int = 16,
    window_rows: int = 32,
    n_wc: int = 2,
    n_k: int = 4,
    morton: bool = True,
    tile_block: int = 8,
    view_block: int = 1,
):
    """Returns (samples (V, N, 3) uint8, valid (V, N) bool).

    ``view_block``: views sharing one grid step (amortizes the per-step
    fixed cost that the round-2.6 floor bisection measured as ~96% of
    the kernel). Clamped to a divisor of the view count. Values are
    unaffected — each (view, vertex) sample is computed identically."""
    n = points.shape[0]
    order = None
    if morton and n:
        order = _morton_order(points)
        points = points[order]
    if not isinstance(colors, StagedColorPlanes):
        colors = stage_color_planes(colors, window_rows)
    nv, _three, hp_s, wp_s = colors.planes.shape
    hgt, wid = colors.h, colors.w
    tile = sj * 128
    tb = max(1, int(tile_block))
    pts_t, nt = stage_point_tiles(points, sj=sj, tile_block=tb)
    out = _gather_colors_padded(
        pts_t,
        jnp.asarray(np.asarray(proj).reshape(nv, 12).astype(np.float32)),
        colors.planes,
        h=int(hgt), w=int(wid), sj=int(sj), tb=tb, vb=int(view_block),
        wr=int(min(window_rows, hp_s)),
        n_wc=int(n_wc), n_k=int(n_k), z_test=bool(z_test),
    )  # (ntb, V, 3, tb*sj, 128)
    # Post-process ON DEVICE (round 5): the round-2..4 path downloaded the
    # PADDED fp32 kernel output (4x the sample bytes) and un-Mortoned on
    # host; now the transpose/compact/un-permute are jnp ops and the
    # device-resident uint8 samples + bool mask are returned — callers
    # that reduce on device (colorize_points) never move raw samples over
    # the host link. np.asarray on the returns reproduces the old arrays
    # bit for bit.
    flat = out.transpose(2, 1, 0, 3, 4).reshape(3, nv, nt * tile)[:, :, :n]
    valid = flat[0] >= 0.0
    samples = jnp.clip(flat, 0.0, None).astype(jnp.uint8)
    samples = jnp.transpose(samples, (1, 2, 0))  # (V, n, 3)
    if order is not None:
        inv = np.empty_like(order)
        inv[order] = np.arange(n)
        inv_d = jnp.asarray(inv)
        samples = jnp.take(samples, inv_d, axis=1)
        valid = jnp.take(valid, inv_d, axis=1)
    return samples, valid
