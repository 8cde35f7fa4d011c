"""Pallas TPU kernel: image gather at arbitrary per-point pixel indices.

Replaces XLA ``jnp.take(image_flat, vi * w + ui)`` — a serialized ~0.1
G elem/s gather on TPU (docs/KERNEL.md) — in the sparse TSDF path
(``ops/sparse_grid.py``), whose per-frame device work is an image read at
the projected pixel of every voxel of every touched block (the sparse-band
analog of the per-thread depth read in
``Reconstruction/CudaReconstruction.cu:158-212``).

Design: callers present points in a spatially coherent order (touched
blocks Morton-sorted, voxels raster-ordered within a block), so consecutive
(sj, 128) index tiles have compact image footprints and the dense kernel's
shared windowed-gather machinery (``integrate_pallas._gather_pixels_multi``)
applies unchanged: static row-select passes cover the common case, the
exact remainder walk everything else — exact for ANY indices. Multiple
same-shape planes (e.g. depth + packed-RG + B color) gather at SHARED
indices for one index pipeline.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from . import integrate_pallas as _ip
from .integrate_pallas import _gather_pixels_multi

__all__ = ["gather_pixels_pallas"]


def _gather_kernel(
    ui_ref, vi_ref, *refs, hp, wp, wr, n_wc, n_k, n_planes, precisions
):
    plane_refs = refs[:n_planes]
    out_refs = refs[n_planes:]
    ui = ui_ref[0]  # (sj, 128) i32; < 0 marks invalid points
    vi = vi_ref[0]
    valid = ui >= 0
    uis = jnp.where(valid, ui, 0)
    vis = jnp.where(valid, vi, 0)
    ds = _gather_pixels_multi(
        plane_refs, uis, vis, valid,
        hp=hp, wp=wp, wr=wr, n_wc=n_wc, n_k=n_k, precisions=precisions,
    )
    for o, d in zip(out_refs, ds):
        o[0] = jnp.where(valid, d, -1.0)


def gather_pixels_pallas(
    planes,  # tuple of (h, w) f32 arrays, same shape
    ui,  # (N,) int32; ui < 0 marks an invalid point
    vi,  # (N,) int32; valid entries must satisfy 0 <= vi < h, 0 <= ui < w
    *,
    sj: int = 8,
    window_rows: int = 32,
    n_wc: int = 2,
    n_k: int = 4,
    precisions=None,
):
    """Gather ``plane[vi[i], ui[i]]`` for every plane at shared indices.

    Returns a tuple of (N,) f32 arrays with -1.0 at invalid points. All ops
    are traced jnp/pallas (safe inside jit; shapes must be static). Tunables
    trade speed only — uncovered indices fall to the exact remainder walk.
    ``precisions``: per-plane select-dot precision (None = HIGHEST, exact
    for full fp32; pass Precision.DEFAULT for bf16-valued planes, e.g.
    uint8 color channels — one exact MXU pass instead of ~6).
    """
    h, w = planes[0].shape
    wr = int(min(window_rows, max(8, -(-h // 8) * 8)))
    ph = max(wr - h, (-h) % 8)
    pw = (-w) % 128
    if ph or pw:
        planes = tuple(
            jnp.pad(p, ((0, ph), (0, pw)), constant_values=-1.0)
            for p in planes
        )
    hp, wp = h + ph, w + pw
    n_wc = int(min(n_wc, wp // 128))
    n = ui.shape[0]
    tile = sj * 128
    pad_n = (-n) % tile
    if pad_n:
        ui = jnp.pad(ui, (0, pad_n), constant_values=-1)
        vi = jnp.pad(vi, (0, pad_n), constant_values=0)
    nt = (n + pad_n) // tile
    ui_t = ui.reshape(nt, sj, 128)
    vi_t = vi.reshape(nt, sj, 128)
    kernel = functools.partial(
        _gather_kernel,
        hp=hp, wp=wp, wr=wr, n_wc=n_wc, n_k=int(n_k), n_planes=len(planes),
        precisions=None if precisions is None else tuple(precisions),
    )
    idx_spec = pl.BlockSpec(
        (1, sj, 128), lambda t: (t, 0, 0), memory_space=pltpu.VMEM
    )
    plane_spec = pl.BlockSpec(
        (hp, wp), lambda t: (0, 0), memory_space=pltpu.VMEM
    )
    out_sds = jax.ShapeDtypeStruct((nt, sj, 128), jnp.float32)
    outs = pl.pallas_call(
        kernel,
        out_shape=tuple(out_sds for _ in planes),
        grid=(nt,),
        in_specs=[idx_spec, idx_spec] + [plane_spec] * len(planes),
        out_specs=tuple(idx_spec for _ in planes),
        interpret=_ip.INTERPRET,
    )(ui_t, vi_t, *planes)
    return tuple(o.reshape(nt * tile)[:n] for o in outs)
