"""Pallas TPU kernel for mesh-coloration color sampling.

Replaces the gather stage of ``MeshColoration::ProcessColoration``
(``Coloration/MeshColoration.cxx:150-170``) — the XLA ``take_along_axis``
path runs ~0.1 G elem/s on TPU (docs/KERNEL.md), which dominates
capstone-scale colorization. Design:

* **RGB packed into one fp32**: ``r*65536 + g*256 + b`` is an integer
  < 2^24, exactly representable in a float32 mantissa — so every vertex
  needs ONE image gather instead of three, and the gather machinery is
  shared verbatim with the TSDF kernel (``integrate_pallas._gather_pixels``:
  one-hot-matmul row selection + zero-iteration remainder walks).
* **Vertex tiles**: marching-cubes output order is raster-coherent (welded
  vertices sort by global edge key), so consecutive (sj, 128) vertex tiles
  have compact image footprints, exactly like voxel subtiles.
* **Grid (tiles, V)** with one packed color plane staged per view; the
  kernel emits the packed SAMPLE per (vertex, view) (invalid -> -1.0), and
  mean / exact masked median / count are computed from the sample buffer
  downstream (``ops/coloration.py``) — no XLA image gathers anywhere.

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
from .integrate_pallas import _gather_pixels, _round_half_away

__all__ = ["gather_colors_pallas", "pack_colors", "unpack_colors"]


def pack_colors(colors: np.ndarray) -> np.ndarray:
    """(..., h, w, 3) uint8 -> (..., h, w) f32 packed r*65536+g*256+b."""
    c = colors.astype(np.float32)
    return c[..., 0] * 65536.0 + c[..., 1] * 256.0 + c[..., 2]


def unpack_colors(packed: np.ndarray) -> np.ndarray:
    """(...,) f32 packed -> (..., 3) uint8 (undefined where packed < 0)."""
    p = np.maximum(packed, 0.0)
    r = np.floor(p / 65536.0)
    g = np.floor((p - r * 65536.0) / 256.0)
    b = p - r * 65536.0 - g * 256.0
    return np.stack([r, g, b], axis=-1).astype(np.uint8)


def _colorize_kernel(
    pts_ref,  # (1, 3*sj, 128) vertex coords: rows [0:sj)=x, [sj:2sj)=y, ...
    proj_ref,  # (V, 12) SMEM: rows of K4@RT (3, 4) flattened
    color_ref,  # (1, hp, wp) packed f32 color plane for this view
    out_ref,  # (1, 1, sj, 128) packed samples for (tile, view)
    *, h, w, hp, wp, sj, wr, n_wc, n_k, z_test,
):
    view = pl.program_id(1)
    xs = pts_ref[0, 0:sj, :]
    ys = pts_ref[0, sj : 2 * sj, :]
    zs = pts_ref[0, 2 * sj : 3 * sj, :]

    def hom(r):
        return (
            proj_ref[view, 4 * r + 0] * xs
            + proj_ref[view, 4 * r + 1] * ys
            + proj_ref[view, 4 * r + 2] * zs
            + proj_ref[view, 4 * r + 3]
        )

    h0, h1, h2 = hom(0), hom(1), hom(2)
    u = _round_half_away(h0 / h2)
    v = _round_half_away(h1 / h2)
    # Reference quirk: NO hom.z < 0 rejection (ReconstructionData.cxx:169-182)
    valid = (u >= 0) & (v >= 0) & (u < w) & (v < h)
    if z_test:
        valid &= h2 > 0
    ui = jnp.where(valid, u, 0.0).astype(jnp.int32)
    vi = jnp.where(valid, v, 0.0).astype(jnp.int32)
    g = _gather_pixels(
        color_ref.at[0], ui, vi, valid, hp=hp, wp=wp, wr=wr, n_wc=n_wc, n_k=n_k
    )
    out_ref[0, 0] = jnp.where(valid, g, -1.0)


@functools.partial(
    jax.jit,
    static_argnames=("h", "w", "sj", "wr", "n_wc", "n_k", "z_test"),
)
def _gather_colors_padded(
    pts, proj, packed, *, h, w, sj, wr, n_wc, n_k, z_test
):
    nt = pts.shape[0]
    nv, hp, wp = packed.shape
    kernel = functools.partial(
        _colorize_kernel,
        h=h, w=w, hp=hp, wp=wp, sj=sj, wr=wr, n_wc=n_wc, n_k=n_k,
        z_test=z_test,
    )
    return pl.pallas_call(
        kernel,
        out_shape=jax.ShapeDtypeStruct((nt, nv, sj, 128), jnp.float32),
        grid=(nt, nv),
        in_specs=[
            pl.BlockSpec((1, 3 * sj, 128), lambda t, v: (t, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((nv, 12), lambda t, v: (0, 0),
                         memory_space=pltpu.SMEM),
            pl.BlockSpec((1, hp, wp), lambda t, v: (v, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec(
            (1, 1, sj, 128), lambda t, v: (t, v, 0, 0),
            memory_space=pltpu.VMEM,
        ),
        interpret=_ip.INTERPRET,
    )(pts, proj, packed)


def gather_colors_pallas(
    points: np.ndarray,  # (N, 3) world vertices (mesh order: raster-coherent)
    proj: np.ndarray,  # (V, 3, 4) rows of K4 @ RT, f32
    colors: np.ndarray,  # (V, h, w, 3) uint8
    z_test: bool = False,
    sj: int = 16,
    window_rows: int = 32,
    n_wc: int = 2,
    n_k: int = 4,
):
    """Returns (samples (V, N, 3) uint8, valid (V, N) bool)."""
    n = points.shape[0]
    nv, hgt, wid = colors.shape[:3]
    packed = pack_colors(colors)
    ph = max(window_rows - hgt, (-hgt) % 8)
    pw = (-wid) % 128
    if ph or pw:
        packed = np.pad(
            packed, ((0, 0), (0, ph), (0, pw)), constant_values=-1.0
        )
    tile = sj * 128
    pad_n = (-n) % tile
    # Padded vertices project via a poisoned w-row: u stays out of bounds.
    pts = np.zeros((n + pad_n, 3), np.float32)
    pts[:n] = points
    nt = (n + pad_n) // tile
    # Layout (nt, 3*sj, 128): per tile, sj rows of x, then y, then z.
    # Padded vertices sit at the origin; they may gather real pixels but are
    # sliced away below — only the last tile's footprint bbox sees them.
    pts_t = (
        pts.reshape(nt, sj, 128, 3)
        .transpose(0, 3, 1, 2)
        .reshape(nt, 3 * sj, 128)
    )
    out = _gather_colors_padded(
        jnp.asarray(pts_t),
        jnp.asarray(proj.reshape(nv, 12).astype(np.float32)),
        jnp.asarray(packed),
        h=int(hgt), w=int(wid), sj=int(sj), wr=int(min(window_rows, hgt + ph)),
        n_wc=int(n_wc), n_k=int(n_k), z_test=bool(z_test),
    )  # (nt, V, sj, 128)
    flat = (
        np.asarray(out).transpose(1, 0, 2, 3).reshape(nv, nt * tile)[:, :n]
    )
    valid = flat >= 0.0
    return unpack_colors(flat), valid
