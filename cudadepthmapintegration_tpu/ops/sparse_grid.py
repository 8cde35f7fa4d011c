"""Sparse block-allocated TSDF fusion (incremental RGB-D sequences).

The reference holds the whole dense grid in GPU memory
(``CudaReconstruction.cu:326``), capping scene size. For incremental fusion
(BASELINE.json config 5) we use the classic voxel-block-hashing layout,
TPU-style:

* the world is an unbounded virtual grid; only fixed-shape blocks that
  intersect the truncation band around observed surfaces are allocated;
* allocated blocks live in one device-resident pool array
  ``(capacity, bz, by, bx)`` — a static shape XLA loves; the block-coord ->
  slot map lives on the host (pure bookkeeping);
* per frame: the host back-projects (subsampled) depth pixels, walks the
  ±delta band along each ray, and allocates the touched blocks; the device
  then integrates the frame into the touched slots only, with the same
  separable-projection + masked ray-potential math as the dense path
  (identical numerics — an allocated block fuses exactly like the dense
  grid would).

Values outside the band are never stored (classic TSDF-hashing trade-off):
isosurface extraction over allocated blocks is exact because the crossing
lives inside the band.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
import numpy as np

from ..core.camera import compose_projection
from ..core.grid import VoxelGrid
from ..core.ray_potential import RayPotential, ray_potential_jnp
from ..core.view import DepthMapView
from ..io.polydata import PolyData

__all__ = ["SparseTSDFGrid"]


@partial(
    jax.jit,
    static_argnames=("h", "w", "thick", "rho", "eta", "delta"),
    donate_argnames=("pool",),
)
def _sparse_integrate(
    pool,  # (cap, bz, by, bx) f32
    slots,  # (B,) int32 touched slots
    proj_rows,  # (4, 4) f64->f32 rows 0..2 of P + camera-z row
    origins,  # (B, 3) f32 world-frame block origins
    axes,  # (3, bmax) f32 within-block center offsets per axis (x, y, z)
    depth_flat,  # (h*w,) f32
    h, w, thick, rho, eta, delta,
):
    bz, by, bx = pool.shape[1:]
    blocks = jnp.take(pool, slots, axis=0)  # (B, bz, by, bx)

    def lattice(r):
        base = (
            proj_rows[r, 0] * origins[:, 0]
            + proj_rows[r, 1] * origins[:, 1]
            + proj_rows[r, 2] * origins[:, 2]
            + proj_rows[r, 3]
        )  # (B,)
        return (
            base[:, None, None, None]
            + (proj_rows[r, 2] * axes[2, :bz])[None, :, None, None]
            + (proj_rows[r, 1] * axes[1, :by])[None, None, :, None]
            + (proj_rows[r, 0] * axes[0, :bx])[None, None, None, :]
        )

    h0, h1, h2, zcam = lattice(0), lattice(1), lattice(2), lattice(3)
    u = jnp.sign(h0 / h2) * jnp.floor(jnp.abs(h0 / h2) + 0.5)
    v = jnp.sign(h1 / h2) * jnp.floor(jnp.abs(h1 / h2) + 0.5)
    valid = (h2 >= 0) & (u >= 0) & (v >= 0) & (u < w) & (v < h)
    ui = jnp.where(valid, u, 0.0).astype(jnp.int32)
    vi = jnp.where(valid, v, 0.0).astype(jnp.int32)
    d = jnp.take(depth_flat, vi * w + ui)
    valid &= d != -1.0
    val = ray_potential_jnp(zcam, d, thick, rho, eta, delta)
    blocks = blocks + jnp.where(valid, val, 0.0)
    return pool.at[slots].set(blocks)


class SparseTSDFGrid:
    """Unbounded sparse TSDF volume with device-pooled blocks."""

    def __init__(
        self,
        voxel_size: float,
        params: RayPotential,
        block_shape: tuple[int, int, int] = (8, 8, 8),
        capacity: int = 1 << 14,
        pixel_stride: int = 4,
    ):
        self.voxel_size = float(voxel_size)
        self.params = params
        self.block_shape = tuple(int(b) for b in block_shape)
        self.capacity = int(capacity)
        self.pixel_stride = int(pixel_stride)
        self.block_map: dict[tuple[int, int, int], int] = {}
        bz, by, bx = self.block_shape
        self.pool = jnp.zeros((self.capacity, bz, by, bx), jnp.float32)
        bmax = max(self.block_shape)
        self._axes = np.zeros((3, bmax), np.float32)
        for a, n in enumerate((bx, by, bz)):
            self._axes[a, :n] = (np.arange(n) + 0.5) * self.voxel_size
        self.frames_fused = 0

    @property
    def num_allocated(self) -> int:
        return len(self.block_map)

    # -- allocation ----------------------------------------------------------

    def _touched_blocks(self, view: DepthMapView) -> set[tuple[int, int, int]]:
        """Back-project subsampled pixels; walk the ±delta band along each
        viewing ray; collect intersected block coords."""
        s = self.pixel_stride
        depth = view.depth[::s, ::s]
        hs, ws = depth.shape
        vs, us = np.meshgrid(
            np.arange(hs) * s, np.arange(ws) * s, indexing="ij"
        )
        mask = depth > 0
        if not mask.any():
            return set()
        z = depth[mask]
        u = us[mask].astype(np.float64)
        v = vs[mask].astype(np.float64)
        k_inv = np.linalg.inv(view.camera.k)
        pix = np.stack([u, v, np.ones_like(u)], axis=1)
        rays = pix @ k_inv.T  # camera-frame directions with dir_z == 1
        rt = view.camera.rt
        r_inv = rt[:3, :3].T
        cam_origin = -r_inv @ rt[:3, 3]
        bs = np.array(
            [self.block_shape[2], self.block_shape[1], self.block_shape[0]],
            np.float64,
        ) * self.voxel_size  # block extent in (x, y, z)
        delta = self.params.delta
        n_steps = max(2, int(np.ceil(2 * delta / min(bs))) + 2)
        touched: set[tuple[int, int, int]] = set()
        for step in np.linspace(-delta, delta, n_steps):
            zs = z + step
            cam_pts = rays * zs[:, None]
            world = cam_pts @ r_inv.T + cam_origin
            coords = np.floor(world / bs).astype(np.int64)
            touched.update(map(tuple, np.unique(coords, axis=0)))
        return touched

    def _allocate(self, coords) -> np.ndarray:
        slots = []
        for c in coords:
            slot = self.block_map.get(c)
            if slot is None:
                slot = len(self.block_map)
                if slot >= self.capacity:
                    raise RuntimeError(
                        f"sparse block pool exhausted (capacity {self.capacity})"
                    )
                self.block_map[c] = slot
            slots.append(slot)
        return np.asarray(slots, np.int32)

    # -- fusion --------------------------------------------------------------

    def integrate_frame(self, view: DepthMapView,
                        threshold_best_cost: float | None = None):
        """Fuse one RGB-D frame; allocates band blocks on the fly."""
        if threshold_best_cost is not None:
            view = view.thresholded(threshold_best_cost)
        coords = sorted(self._touched_blocks(view))
        if not coords:
            return self
        slots = self._allocate(coords)
        # Bucket the block count to limit jit recompiles across frames:
        # padded entries use slot == capacity, which jnp gathers clamp
        # (reading garbage that is then discarded) and scatters DROP
        # (out-of-bounds updates are dropped in XLA) — so padding is inert.
        bucket = 512
        pad = (-len(slots)) % bucket
        if pad:
            slots = np.concatenate(
                [slots, np.full(pad, self.capacity, np.int32)]
            )
            coords = list(coords) + [(0, 0, 0)] * pad
        bs = np.array(
            [self.block_shape[2], self.block_shape[1], self.block_shape[0]],
            np.float64,
        ) * self.voxel_size
        origins = (np.array(coords, np.float64) * bs).astype(np.float32)
        p, cam_row = compose_projection(view.camera, None)
        proj_rows = np.vstack([p[:3, :], cam_row[None, :]]).astype(np.float32)
        h, w = view.depth.shape
        self.pool = _sparse_integrate(
            self.pool,
            jnp.asarray(slots),
            jnp.asarray(proj_rows),
            jnp.asarray(origins),
            jnp.asarray(self._axes),
            jnp.asarray(view.depth.reshape(-1).astype(np.float32)),
            h=int(h), w=int(w),
            thick=float(self.params.thick), rho=float(self.params.rho),
            eta=float(self.params.eta), delta=float(self.params.delta),
        )
        self.frames_fused += 1
        return self

    # -- extraction ----------------------------------------------------------

    def allocated_bounds(self):
        """((zmin, ymin, xmin), (zmax, ymax, xmax)) in block coords, or None."""
        if not self.block_map:
            return None
        arr = np.array(list(self.block_map.keys()))  # (N, 3) as (x, y, z)
        lo = arr.min(axis=0)
        hi = arr.max(axis=0)
        return lo, hi

    def to_dense(self) -> tuple[np.ndarray, VoxelGrid]:
        """Materialize allocated blocks into a dense (cz, cy, cx) volume +
        its VoxelGrid (for meshing / interop). Unallocated space is 0."""
        bounds = self.allocated_bounds()
        if bounds is None:
            raise ValueError("no blocks allocated")
        lo, hi = bounds
        nbx, nby, nbz = (hi - lo) + 1
        bz, by, bx = self.block_shape
        dense = np.zeros((nbz * bz, nby * by, nbx * bx), np.float32)
        pool = np.asarray(jax.device_get(self.pool))
        for (cx_, cy_, cz_), slot in self.block_map.items():
            iz = (cz_ - lo[2]) * bz
            iy = (cy_ - lo[1]) * by
            ix = (cx_ - lo[0]) * bx
            dense[iz : iz + bz, iy : iy + by, ix : ix + bx] = pool[slot]
        origin = (
            lo[0] * bx * self.voxel_size,
            lo[1] * by * self.voxel_size,
            lo[2] * bz * self.voxel_size,
        )
        grid = VoxelGrid(
            dims=(nbx * bx + 1, nby * by + 1, nbz * bz + 1),
            origin=origin,
            spacing=(self.voxel_size,) * 3,
        )
        return dense, grid

    def extract_mesh(self, iso: float = 0.0) -> PolyData:
        from .marching_cubes import extract_isosurface

        dense, grid = self.to_dense()
        return extract_isosurface(grid, dense, iso)
