"""Mesh coloration: per-vertex color statistics over all views.

TPU-native re-design of ``MeshColoration::ProcessColoration``
(``Coloration/MeshColoration.cxx:98-199``): the reference's O(V x views)
scalar CPU loop becomes a batched project->gather->masked-reduction over a
(vertex-chunk, view) lattice.

Reference semantics preserved exactly:

* Projection via ``TransformWorldToDepthMapPosition``
  (``Sources/ReconstructionData.cxx:169-182``): cam = RT @ p; hom = K @ cam;
  pixel = round(hom.xy / hom.z). **No** hom.z<0 rejection and **no** occlusion
  test — vertices behind a camera can still land in bounds and sample color;
  we mirror that (a `visibility_z_test` opt-in gives the corrected behavior).
* Bounds test against view-0 dimensions (``MeshColoration.cxx:158-163``).
* Color gather with the bottom-left y-flip (``ReconstructionData.cxx:107``) —
  absorbed here by loading images top-down.
* ``MeanColoration``: the reference's ``std::accumulate(..., 0)`` int-init
  accumulates exactly for uchar-valued doubles, then vtk's SetTuple3 into a
  uchar array *truncates*; we therefore floor the mean into uint8.
* ``MedianColoration``: sort + middle; even counts average the two middle
  values (``Sources/Helper.h:174-187``), then truncate to uint8.
* ``NbProjectedDepthMap``: int count of in-bounds projections.
* Zero-hit vertices keep (0,0,0)/0 (``MeshColoration.cxx:113-133,173``).
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
import numpy as np

from ..core.view import DepthMapView
from ..io.polydata import PolyData

__all__ = ["colorize_mesh", "colorize_points"]


@partial(jax.jit, static_argnames=("h", "w", "z_test"))
def _colorize_chunk(points, proj, colors_flat, h, w, z_test):
    """points (N, 3); proj (V, 3, 4); colors_flat (V, h*w, 3) uint8.

    Returns mean (N, 3) f32, median (N, 3) f32, count (N,) int32.
    """
    # hom[v, n, r] = proj[v, r, :3] @ p + proj[v, r, 3]
    hom = jnp.einsum("vrc,nc->vnr", proj[:, :, :3], points) + proj[:, None, :, 3]
    z = hom[..., 2]
    u = hom[..., 0] / z
    v = hom[..., 1] / z
    # std::round: half away from zero (ReconstructionData.cxx:179-181).
    pu = jnp.sign(u) * jnp.floor(jnp.abs(u) + 0.5)
    pv = jnp.sign(v) * jnp.floor(jnp.abs(v) + 0.5)
    valid = (pu >= 0) & (pv >= 0) & (pu < w) & (pv < h)
    if z_test:
        valid &= z > 0
    ui = jnp.where(valid, pu, 0).astype(jnp.int32)
    vi = jnp.where(valid, pv, 0).astype(jnp.int32)
    idx = vi * w + ui  # (V, N)
    rgb = jnp.take_along_axis(
        colors_flat, idx[..., None].astype(jnp.int32), axis=1
    ).astype(jnp.float32)  # (V, N, 3)

    count = valid.sum(axis=0).astype(jnp.int32)  # (N,)
    maskf = valid[..., None].astype(jnp.float32)
    mean = (rgb * maskf).sum(axis=0) / jnp.maximum(count[:, None], 1)

    # Masked median: invalid -> +inf, sort ascending over the view axis, then
    # the two middle *valid* entries are at (count-1)//2 and count//2.
    big = jnp.where(valid[..., None], rgb, jnp.inf)
    srt = jnp.sort(big, axis=0)  # (V, N, 3)
    lo = jnp.maximum((count - 1) // 2, 0)
    hi = count // 2
    take = lambda i: jnp.take_along_axis(srt, i[None, :, None].repeat(3, 2), axis=0)[0]
    med = 0.5 * (take(lo) + take(hi))
    med = jnp.where(count[:, None] > 0, med, 0.0)
    mean = jnp.where(count[:, None] > 0, mean, 0.0)
    return mean, med, count


def colorize_points(
    points: np.ndarray,
    views: list[DepthMapView],
    chunk: int = 1 << 16,
    z_test: bool = False,
    dtype=np.float32,
) -> tuple[np.ndarray, np.ndarray, np.ndarray]:
    """Color statistics for (N, 3) world points against all views.

    `dtype` is the projection compute precision: float32 (TPU default) may
    flip a pixel on exact rounding boundaries vs the float64 reference;
    float64 reproduces the reference bit-for-bit (CPU/testing).

    Returns (mean_uint8 (N,3), median_uint8 (N,3), count_int32 (N,)).
    """
    if not views:
        raise ValueError("no views given for coloration")
    dtype = np.dtype(dtype)
    h, w = views[0].depth.shape
    proj = np.stack(
        [
            (v.camera.k4 @ v.camera.rt)[:3, :]  # (3, 4)
            for v in views
        ]
    ).astype(np.float64)
    colors = np.stack(
        [
            v.color
            if v.color is not None
            else np.zeros((h, w, 3), np.uint8)
            for v in views
        ]
    )
    colors_flat = jnp.asarray(colors.reshape(len(views), h * w, 3))
    proj_j = jnp.asarray(proj.astype(dtype))

    n = points.shape[0]
    means = np.zeros((n, 3), np.float32)
    meds = np.zeros((n, 3), np.float32)
    counts = np.zeros((n,), np.int32)
    # Bucket the chunk size to powers of two to bound jit recompiles.
    pad_n = min(chunk, max(256, 1 << (max(1, n) - 1).bit_length()))
    for start in range(0, n, chunk):
        stop = min(start + chunk, n)
        block = np.zeros((pad_n, 3), dtype)
        block[: stop - start] = points[start:stop]
        m, md, c = _colorize_chunk(
            jnp.asarray(block), proj_j, colors_flat, h=h, w=w, z_test=z_test
        )
        means[start:stop] = np.asarray(m)[: stop - start]
        meds[start:stop] = np.asarray(md)[: stop - start]
        counts[start:stop] = np.asarray(c)[: stop - start]

    # vtk uchar-array SetTuple truncates doubles (MeshColoration.cxx:180,185).
    mean_u8 = np.clip(means, 0, 255).astype(np.uint8)
    med_u8 = np.clip(meds, 0, 255).astype(np.uint8)
    return mean_u8, med_u8, counts


def colorize_mesh(
    mesh: PolyData,
    views: list[DepthMapView],
    chunk: int = 1 << 16,
    z_test: bool = False,
    dtype=np.float32,
) -> PolyData:
    """Attach MeanColoration / MedianColoration / NbProjectedDepthMap arrays
    (names per ``MeshColoration.cxx:113-133``) to a copy of `mesh`."""
    out = PolyData(mesh.points.copy(), mesh.triangles.copy())
    out.point_data = dict(mesh.point_data)
    mean_u8, med_u8, counts = colorize_points(
        mesh.points, views, chunk=chunk, z_test=z_test, dtype=dtype
    )
    out.point_data["MeanColoration"] = mean_u8
    out.point_data["MedianColoration"] = med_u8
    out.point_data["NbProjectedDepthMap"] = counts.astype(np.int32)
    return out
