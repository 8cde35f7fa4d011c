"""Distributed mesh coloration: vertices sharded across all mesh devices.

Coloration is per-vertex independent (``MeshColoration.cxx:140-190``), so it
shards as pure data parallelism: vertices are partitioned over every device
of the mesh and GSPMD partitions the project->gather->reduce body with no
communication (results are gathered once at the end).

Views are streamed in ``view_chunk`` batches — only one batch of color
images is ever replicated across the mesh (a 1000-view rig at 512^2 RGB
would otherwise replicate ~0.8 GB per chip); gathered samples
(views x vertices/device x 3 uint8) are what persists for the exact masked
median, mirroring ``ops/coloration.py``'s single-device streaming layout.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from ..ops.coloration import (
    _gather_chunk,
    _median_from_samples,
    _view_colors,
    _view_proj,
)

__all__ = ["sharded_colorize_points"]


def sharded_colorize_points(
    points: np.ndarray,
    views,
    mesh: Mesh,
    view_chunk: int = 64,
    z_test: bool = False,
    dtype=np.float32,
):
    """Like ops.coloration.colorize_points but sharded over the mesh.

    Returns (mean_uint8 (N,3), median_uint8 (N,3), count_int32 (N,)).
    """
    n_views = len(views)
    if n_views == 0:
        raise ValueError("no views given for coloration")
    dtype = np.dtype(dtype)
    h, w = views[0].depth.shape
    n = points.shape[0]
    n_dev = mesh.devices.size
    pad = (-n) % n_dev
    pts = np.zeros((n + pad, 3), dtype)
    pts[:n] = points

    all_axes = tuple(mesh.axis_names)
    vert_sh = NamedSharding(mesh, P(all_axes, None))
    repl = NamedSharding(mesh, P())
    pts_sh = jax.device_put(pts, vert_sh)

    vc = min(view_chunk, n_views)
    # Device-resident accumulation (round 5, mirrors ops/coloration.py):
    # gathered samples stay SHARDED on device — the old loop pulled every
    # block to host and re-uploaded it for the median. Mean numerators are
    # per-view-batch device fp32 sums (integer-exact for uchar samples)
    # accumulated in fp64 on host; only per-batch statistics and the final
    # median cross the host link.
    from ..ops.coloration import _batch_sum_count

    sample_parts, valid_parts = [], []
    sum_host = np.zeros((n + pad, 3), np.float64)
    cnt_host = np.zeros((n + pad,), np.int64)
    for vs in range(0, n_views, vc):
        ve = min(vs + vc, n_views)
        batch = [views[i] for i in range(vs, ve)]
        proj = np.stack([_view_proj(v) for v in batch]).astype(dtype)
        colors = np.stack([_view_colors(v, h, w) for v in batch])
        rgb, ok = _gather_chunk(
            pts_sh,
            jax.device_put(proj, repl),
            jax.device_put(
                jnp.asarray(colors.reshape(len(batch), h * w, 3)), repl
            ),
            h=int(h), w=int(w), z_test=z_test,
        )
        sample_parts.append(rgb)
        valid_parts.append(ok)
        bs, bc = _batch_sum_count(rgb, ok)
        sum_host += np.asarray(bs, np.float64)
        cnt_host += np.asarray(bc, np.int64)

    med = _median_from_samples(
        jnp.concatenate(sample_parts, axis=0),
        jnp.concatenate(valid_parts, axis=0),
    )
    med = np.asarray(med)[:n]
    c = cnt_host[:n]
    mean = sum_host[:n] / np.maximum(c[:, None], 1)
    mean_u8 = np.clip(mean, 0, 255).astype(np.uint8)
    med_u8 = np.clip(med, 0, 255).astype(np.uint8)
    return mean_u8, med_u8, c.astype(np.int32)
