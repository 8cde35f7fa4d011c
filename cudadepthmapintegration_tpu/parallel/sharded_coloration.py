"""Distributed mesh coloration: vertices sharded across all mesh devices.

Coloration is per-vertex independent (``MeshColoration.cxx:140-190``), so it
shards as pure data parallelism: vertices are partitioned over every device
of the mesh, color images are replicated, and GSPMD partitions the
project->gather->reduce body with no communication (results are gathered once
at the end).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from ..core.view import DepthMapView
from ..ops.coloration import _colorize_chunk

__all__ = ["sharded_colorize_points"]


def sharded_colorize_points(
    points: np.ndarray,
    views: list[DepthMapView],
    mesh: Mesh,
    z_test: bool = False,
    dtype=np.float32,
):
    """Like ops.coloration.colorize_points but sharded over the mesh.

    Returns (mean_uint8 (N,3), median_uint8 (N,3), count_int32 (N,)).
    """
    if not views:
        raise ValueError("no views given for coloration")
    dtype = np.dtype(dtype)
    h, w = views[0].depth.shape
    n = points.shape[0]
    n_dev = mesh.devices.size
    pad = (-n) % n_dev
    pts = np.zeros((n + pad, 3), dtype)
    pts[:n] = points

    proj = np.stack(
        [(v.camera.k4 @ v.camera.rt)[:3, :] for v in views]
    ).astype(dtype)
    colors = np.stack(
        [
            v.color if v.color is not None else np.zeros((h, w, 3), np.uint8)
            for v in views
        ]
    ).reshape(len(views), h * w, 3)

    all_axes = tuple(mesh.axis_names)
    pts_sh = jax.device_put(pts, NamedSharding(mesh, P(all_axes, None)))
    repl = NamedSharding(mesh, P())
    mean, med, count = _colorize_chunk(
        pts_sh,
        jax.device_put(proj, repl),
        jax.device_put(jnp.asarray(colors), repl),
        h=int(h), w=int(w), z_test=z_test,
    )
    mean = np.asarray(mean)[:n]
    med = np.asarray(med)[:n]
    count = np.asarray(count)[:n]
    mean_u8 = np.clip(mean, 0, 255).astype(np.uint8)
    med_u8 = np.clip(med, 0, 255).astype(np.uint8)
    return mean_u8, med_u8, count.astype(np.int32)
