"""ctypes bindings to the native runtime library (libcdmi_native.so).

The native layer provides the host-side C++ components mirroring the
reference's native stack (SURVEY.md section 2 checklist):

* VTK-XML payload codec (base64 + zlib block streams) — counterpart of the
  VTK reader internals behind ``Sources/ReconstructionData.cxx:223-229``;
* float64 TSDF integrator — CPU counterpart of the CUDA kernel
  (``Reconstruction/CudaReconstruction.cu:158-212``), threaded over z-slabs;
* marching-cubes table walker — CPU counterpart of the contouring step
  (``Reconstruction/main.cxx:169-173``), sharing Python's lookup tables.

Everything degrades gracefully: if the library is missing it is built on
demand with ``make``; if that fails, callers fall back to the pure
Python/JAX implementations (``available()`` reports the state).
"""

from __future__ import annotations

import ctypes
import os
import subprocess

import numpy as np

__all__ = [
    "available",
    "base64_decode",
    "base64_encode",
    "zlib_decode_blocks",
    "integrate_f64",
    "marching_cubes_f64",
]

_REPO_ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
_LIB_PATH = os.path.join(_REPO_ROOT, "native", "build", "libcdmi_native.so")
_lib = None
_tried = False

_i64 = ctypes.c_int64
_dbl = ctypes.c_double
_p_u8 = np.ctypeslib.ndpointer(np.uint8, flags="C_CONTIGUOUS")
_p_i32 = np.ctypeslib.ndpointer(np.int32, flags="C_CONTIGUOUS")
_p_i64 = np.ctypeslib.ndpointer(np.int64, flags="C_CONTIGUOUS")
_p_f64 = np.ctypeslib.ndpointer(np.float64, flags="C_CONTIGUOUS")


def _load():
    global _lib, _tried
    if _lib is not None or _tried:
        return _lib
    _tried = True
    if not os.path.exists(_LIB_PATH):
        try:
            subprocess.run(
                ["make", "-C", os.path.join(_REPO_ROOT, "native")],
                check=True, capture_output=True, timeout=120,
            )
        except Exception:
            return None
    try:
        lib = ctypes.CDLL(_LIB_PATH)
    except OSError:
        return None

    lib.cdmi_base64_decode.restype = _i64
    lib.cdmi_base64_decode.argtypes = [ctypes.c_char_p, _i64, _p_u8, _i64]
    lib.cdmi_base64_encode.restype = _i64
    lib.cdmi_base64_encode.argtypes = [_p_u8, _i64, ctypes.c_char_p, _i64]
    lib.cdmi_zlib_decode_blocks.restype = _i64
    lib.cdmi_zlib_decode_blocks.argtypes = [_p_u8, _p_i64, _i64, _p_u8, _i64]
    lib.cdmi_zlib_encode_blocks.restype = _i64
    lib.cdmi_zlib_encode_blocks.argtypes = [
        _p_u8, _i64, _i64, _p_u8, _i64, _p_i64, _i64,
    ]
    lib.cdmi_integrate_f64.restype = None
    lib.cdmi_integrate_f64.argtypes = [
        _p_f64, _p_f64, _p_f64,
        ctypes.c_int, ctypes.c_int, ctypes.c_int,
        ctypes.c_int, ctypes.c_int, ctypes.c_int,
        _dbl, _dbl, _dbl, _dbl, _dbl, _dbl,
        _dbl, _dbl, _dbl, _dbl,
        _p_f64, ctypes.c_int,
    ]
    lib.cdmi_marching_cubes_f64.restype = _i64
    lib.cdmi_marching_cubes_f64.argtypes = [
        _p_f64, ctypes.c_int, ctypes.c_int, ctypes.c_int, _dbl,
        _p_f64, _p_f64, _p_f64,
        _p_i32, _p_i32, _p_i32, _p_i32,
        _p_f64, _p_i64, _i64,
    ]
    _lib = lib
    return _lib


def available() -> bool:
    return _load() is not None


def base64_decode(text: bytes | str) -> bytes:
    lib = _load()
    if isinstance(text, str):
        text = text.encode("ascii")
    cap = (len(text) // 4 + 1) * 3
    out = np.empty(cap, np.uint8)
    n = lib.cdmi_base64_decode(text, len(text), out, cap)
    if n < 0:
        raise ValueError("invalid base64 input")
    return out[:n].tobytes()


def base64_encode(data: bytes) -> str:
    lib = _load()
    src = np.frombuffer(data, np.uint8)
    cap = (len(data) + 2) // 3 * 4 + 4
    out = ctypes.create_string_buffer(cap)
    n = lib.cdmi_base64_encode(src, len(data), out, cap)
    if n < 0:
        raise ValueError("base64 encode overflow")
    return out.raw[:n].decode("ascii")


def zlib_decode_blocks(blocks: bytes, csizes, total_out: int) -> bytes:
    lib = _load()
    src = np.frombuffer(blocks, np.uint8)
    cs = np.ascontiguousarray(csizes, np.int64)
    out = np.empty(total_out, np.uint8)
    n = lib.cdmi_zlib_decode_blocks(src, cs, len(cs), out, total_out)
    if n < 0:
        raise ValueError("zlib block decode failed")
    return out[:n].tobytes()


def integrate_f64(grid, views, params, initial=None, n_threads=None):
    """Native CPU fusion: same call shape as ops.oracle.integrate_views_oracle."""
    from .core.camera import compose_projection

    lib = _load()
    if lib is None:
        raise RuntimeError("native library unavailable")
    n_threads = n_threads or (os.cpu_count() or 1)
    cz, cy, cx = grid.volume_shape
    out = (
        np.zeros((cz, cy, cx), np.float64)
        if initial is None
        else np.ascontiguousarray(initial, np.float64).copy()
    )
    h, w = views[0].depth.shape
    proj = np.empty((len(views), 12), np.float64)
    cam_rows = np.empty((len(views), 4), np.float64)
    depths = np.empty((len(views), h * w), np.float64)
    for i, v in enumerate(views):
        p, c = compose_projection(v.camera, grid)
        proj[i] = p[:3, :].reshape(-1)
        cam_rows[i] = c
        depths[i] = np.ascontiguousarray(v.depth, np.float64).reshape(-1)
    ox, oy, oz = grid.origin
    sx, sy, sz = grid.spacing
    lib.cdmi_integrate_f64(
        np.ascontiguousarray(proj), np.ascontiguousarray(cam_rows),
        np.ascontiguousarray(depths),
        len(views), int(h), int(w), cx, cy, cz,
        ox, oy, oz, sx, sy, sz,
        float(params.thick), float(params.rho),
        float(params.eta), float(params.delta),
        out, int(n_threads),
    )
    return out


def marching_cubes_f64(point_volume, iso, xs, ys, zs):
    """Native MC walk; returns (verts (T, 3, 3), keys (T, 3)) in grid frame."""
    from .ops.mc_tables import (
        CORNER_OFFSETS,
        EDGE_CANONICAL,
        EDGE_CORNERS,
        TRI_TABLE,
    )

    lib = _load()
    if lib is None:
        raise RuntimeError("native library unavailable")
    pv = np.ascontiguousarray(point_volume, np.float64)
    nz, ny, nx = pv.shape
    xs = np.ascontiguousarray(xs, np.float64)
    ys = np.ascontiguousarray(ys, np.float64)
    zs = np.ascontiguousarray(zs, np.float64)
    tri = np.ascontiguousarray(TRI_TABLE, np.int32)
    ec = np.ascontiguousarray(EDGE_CORNERS, np.int32)
    co = np.ascontiguousarray(CORNER_OFFSETS, np.int32)
    canon = np.ascontiguousarray(EDGE_CANONICAL, np.int32)

    cap = 1024
    while True:
        verts = np.empty((cap, 3, 3), np.float64)
        keys = np.empty((cap, 3), np.int64)
        n = lib.cdmi_marching_cubes_f64(
            pv.reshape(-1), nz, ny, nx, float(iso), xs, ys, zs,
            tri.reshape(-1), ec.reshape(-1), co.reshape(-1), canon.reshape(-1),
            verts.reshape(-1), keys.reshape(-1), cap,
        )
        if n <= cap:
            return verts[:n], keys[:n]
        cap = int(n) + 64
