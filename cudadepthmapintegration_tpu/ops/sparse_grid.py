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
  then integrates the frame into the union of the touched slots and every
  already-allocated block inside the frame's frustum (``carve=True``), with
  the same separable-projection + masked ray-potential math as the dense
  path. Frustum re-integration matters: the dense kernel applies the
  ``-eta*rho`` empty-space vote to every voxel in front of the surface
  (``CudaReconstruction.cu:114-115``), so an allocated block sitting in a
  later frame's free space must receive that vote too.

Parity contract (tested): once a block is allocated, every SUBSEQUENT frame
contributes to it exactly as the dense grid would. Frames fused BEFORE a
block's allocation contribute nothing to it — in the dense path those early
contributions are free-space/invisible votes only (the block was outside
every earlier band), so late-allocated blocks can sit slightly above their
dense value. Pre-walking a known trajectory with :meth:`preallocate` makes
sparse == dense exactly.

Isosurface extraction is PER BLOCK (memory ∝ allocated blocks, never the
bounding box): each block contours its own cells with a 1-cell halo from
its neighbors; cell->point averaging is MASKED to allocated cells, so the
fabricated 0.0 of unallocated space never enters a point value and the
allocation boundary cannot emit spurious zero-crossing sheets; vertices
are welded across blocks by canonical global edge keys (exact integer
identity, same scheme as ``parallel/sharded_mesh.py``).
"""

from __future__ import annotations

import itertools
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
    static_argnames=("h", "w", "thick", "rho", "eta", "delta", "use_pallas"),
    donate_argnames=("pool",),
)
def _sparse_integrate(
    pool,  # (cap, bz, by, bx) f32
    slots,  # (B,) int32 touched slots
    proj_rows,  # (4, 4) f64->f32 rows 0..2 of P + camera-z row
    origins,  # (B, 3) f32 world-frame block origins
    axes,  # (3, bmax) f32 within-block center offsets per axis (x, y, z)
    depth,  # (h, w) f32
    h, w, thick, rho, eta, delta, use_pallas=False,
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
    # Barriers pin cross-backend bit-identity: use_pallas is a STATIC arg,
    # so the two backends are two separately compiled programs whose fusion
    # shapes differ around the gather — XLA's FMA contraction could then
    # differ inside the projection math and flip a round-half pixel.
    # Cutting the fusion here makes the projection and accumulate
    # subgraphs identical in both programs, so per-voxel content is
    # comparable bitwise (bench.py gates on it; note the pallas path also
    # Morton-orders block ALLOCATION, so pool-slot order — and any
    # slot-ordered reduction like pool.sum() — legitimately differs).
    u, v, zcam, valid = jax.lax.optimization_barrier((u, v, zcam, valid))
    d = _gather_depth(depth, u, v, valid, h, w, use_pallas)
    d = jax.lax.optimization_barrier(d)
    valid &= d != -1.0
    val = ray_potential_jnp(zcam, d, thick, rho, eta, delta)
    blocks = blocks + jnp.where(valid, val, 0.0)
    return pool.at[slots].set(blocks)


def _gather_depth(depth, u, v, valid, h, w, use_pallas):
    """``depth[v, u]`` where valid (else -1.0). use_pallas routes through
    the windowed Pallas point-gather (``kernels/gather_points.py``, >10x
    the serialized XLA gather on TPU; blocks arrive Morton-sorted so tile
    footprints stay compact); the XLA path serves CPU runs."""
    if use_pallas:
        from ..kernels.gather_points import gather_pixels_pallas

        ui = jnp.where(valid, u, -1.0).astype(jnp.int32)
        vi = jnp.where(valid, v, 0.0).astype(jnp.int32)
        (d_flat,) = gather_pixels_pallas(
            (depth,), ui.reshape(-1), vi.reshape(-1)
        )
        return d_flat.reshape(u.shape)
    ui = jnp.where(valid, u, 0.0).astype(jnp.int32)
    vi = jnp.where(valid, v, 0.0).astype(jnp.int32)
    d = jnp.take(depth.reshape(-1), vi * w + ui)
    return jnp.where(valid, d, -1.0)


@partial(
    jax.jit,
    static_argnames=("h", "w", "band", "use_pallas"),
    donate_argnames=("color_pool", "weight_pool"),
)
def _sparse_accumulate_color(
    color_pool,  # (cap, bz, by, bx, 3) f32 weighted color sums
    weight_pool,  # (cap, bz, by, bx) f32 observation counts
    slots,  # (B,) int32 touched slots
    proj_rows,  # (4, 4) f32 rows 0..2 of P + camera-z row
    origins,  # (B, 3) f32 world-frame block origins
    axes,  # (3, bmax) f32 within-block center offsets per axis
    depth,  # (h, w) f32
    rgb,  # (h, w, 3) f32
    h, w, band, use_pallas=False,
):
    """Online color accumulation: voxels within ±band of this frame's
    surface add the pixel's RGB weighted by linear proximity falloff
    ``1 - |z_cam - depth|/band`` (the classic weighted TSDF color scheme
    — no reference counterpart; the reference colorizes post-hoc,
    ``Coloration/MeshColoration.cxx``). The falloff keeps near-surface
    samples dominant while still covering voxels seen only at grazing
    angles, where the along-ray distance to the surface is much larger
    than the Euclidean one."""
    bz, by, bx = weight_pool.shape[1:]

    def lattice(r):
        base = (
            proj_rows[r, 0] * origins[:, 0]
            + proj_rows[r, 1] * origins[:, 1]
            + proj_rows[r, 2] * origins[:, 2]
            + proj_rows[r, 3]
        )
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
    # Same cross-backend fusion isolation as _sparse_integrate (see the
    # barrier comment there).
    u, v, zcam, valid = jax.lax.optimization_barrier((u, v, zcam, valid))
    if use_pallas:
        from ..kernels.gather_points import gather_pixels_pallas

        # Depth + the three uint8-valued channel planes share one index
        # pipeline; bf16-exact channels select at DEFAULT precision (one
        # MXU pass each), depth keeps the exact HIGHEST dot.
        P = jax.lax.Precision
        ui = jnp.where(valid, u, -1.0).astype(jnp.int32)
        vi = jnp.where(valid, v, 0.0).astype(jnp.int32)
        d_f, r_f, g_f, b_f = gather_pixels_pallas(
            (depth, rgb[..., 0], rgb[..., 1], rgb[..., 2]),
            ui.reshape(-1), vi.reshape(-1),
            precisions=(P.HIGHEST, P.DEFAULT, P.DEFAULT, P.DEFAULT),
        )
        d = d_f.reshape(u.shape)
        rgb_s = jnp.stack(
            [jnp.maximum(c.reshape(u.shape), 0.0) for c in (r_f, g_f, b_f)],
            axis=-1,
        )  # (B, bz, by, bx, 3)
    else:
        ui = jnp.where(valid, u, 0.0).astype(jnp.int32)
        vi = jnp.where(valid, v, 0.0).astype(jnp.int32)
        d = jnp.take(depth.reshape(-1), vi * w + ui)
        rgb_s = jnp.take(
            rgb.reshape(-1, 3), vi * w + ui, axis=0
        )  # (B, bz, by, bx, 3)
    d, rgb_s = jax.lax.optimization_barrier((d, rgb_s))
    near = valid & (d != -1.0)
    falloff = jnp.maximum(0.0, 1.0 - jnp.abs(zcam - d) / band)
    wadd = near.astype(jnp.float32) * falloff
    color_pool = color_pool.at[slots].add(rgb_s * wadd[..., None])
    weight_pool = weight_pool.at[slots].add(wadd)
    return color_pool, weight_pool


class SparseTSDFGrid:
    """Unbounded sparse TSDF volume with device-pooled blocks."""

    def __init__(
        self,
        voxel_size: float,
        params: RayPotential,
        block_shape: tuple[int, int, int] = (8, 8, 8),
        capacity: int = 1 << 14,
        pixel_stride: int = 4,
        with_color: bool = False,
        gather_backend: str = "auto",
    ):
        self.voxel_size = float(voxel_size)
        self.params = params
        self.block_shape = tuple(int(b) for b in block_shape)
        self.capacity = int(capacity)
        self.pixel_stride = int(pixel_stride)
        self.with_color = bool(with_color)
        # 'pallas': windowed point-gather kernel for the per-frame depth /
        # color image reads (TPU; interpret-mode on CPU only in tests).
        # 'xla': serialized jnp.take (portable). 'auto': pallas on TPU.
        if gather_backend not in ("auto", "pallas", "xla"):
            raise ValueError(f"unknown gather_backend {gather_backend!r}")
        if gather_backend == "auto":
            import jax as _jax

            # Whitelist TPU-ish backends: the kernel is Mosaic-lowered, so
            # any other accelerator must take the portable XLA path.
            gather_backend = (
                "pallas"
                if _jax.default_backend() in ("tpu", "axon")
                else "xla"
            )
        self._use_pallas = gather_backend == "pallas"
        self.block_map: dict[tuple[int, int, int], int] = {}
        self._free_slots: list[int] = []
        self._next_slot = 0
        bz, by, bx = self.block_shape
        self.pool = jnp.zeros((self.capacity, bz, by, bx), jnp.float32)
        self.color_pool = None
        self.weight_pool = None
        if self.with_color:
            self.color_pool = jnp.zeros(
                (self.capacity, bz, by, bx, 3), jnp.float32
            )
            self.weight_pool = jnp.zeros(
                (self.capacity, bz, by, bx), jnp.float32
            )
        bmax = max(self.block_shape)
        self._axes = np.zeros((3, bmax), np.float32)
        for a, n in enumerate((bx, by, bz)):
            self._axes[a, :n] = (np.arange(n) + 0.5) * self.voxel_size
        self.frames_fused = 0

    @property
    def num_allocated(self) -> int:
        return len(self.block_map)

    # -- persistence ---------------------------------------------------------

    def save(self, path: str, extra: dict | None = None) -> None:
        """Atomic checkpoint of the full sparse state: config, block hash
        map, the USED prefix of the device pools, frame counter, and a
        JSON-serializable ``extra`` dict for the caller (e.g. the driving
        CLI's frame cursor). Written via tmp + ``os.replace`` so a crash
        mid-save leaves the previous checkpoint intact."""
        import json
        import os

        ns = self._next_slot
        coords = np.array(sorted(self.block_map), np.int64).reshape(-1, 3)
        slots = np.array(
            [self.block_map[tuple(c)] for c in coords], np.int64
        )
        data = {
            "version": 1,
            "voxel_size": self.voxel_size,
            "params": np.array(
                [self.params.thick, self.params.rho,
                 self.params.eta, self.params.delta], np.float64
            ),
            "block_shape": np.array(self.block_shape, np.int64),
            "capacity": self.capacity,
            "pixel_stride": self.pixel_stride,
            "with_color": self.with_color,
            "coords": coords,
            "slots": slots,
            "free_slots": np.array(self._free_slots, np.int64),
            "next_slot": ns,
            "frames_fused": self.frames_fused,
            "pool": np.asarray(self.pool[:ns]),
            "extra_json": json.dumps(extra or {}),
        }
        if self.with_color:
            data["color_pool"] = np.asarray(self.color_pool[:ns])
            data["weight_pool"] = np.asarray(self.weight_pool[:ns])
        tmp = f"{path}.tmp"
        with open(tmp, "wb") as f:
            np.savez_compressed(f, **data)
        os.replace(tmp, path)

    @classmethod
    def load(cls, path: str, gather_backend: str = "auto"):
        """Restore a :meth:`save` checkpoint. Returns ``(grid, extra)``."""
        import json

        with np.load(path, allow_pickle=False) as z:
            p = z["params"]
            grid = cls(
                voxel_size=float(z["voxel_size"]),
                params=RayPotential(
                    thick=float(p[0]), rho=float(p[1]),
                    eta=float(p[2]), delta=float(p[3]),
                ),
                block_shape=tuple(int(b) for b in z["block_shape"]),
                capacity=int(z["capacity"]),
                pixel_stride=int(z["pixel_stride"]),
                with_color=bool(z["with_color"]),
                gather_backend=gather_backend,
            )
            ns = int(z["next_slot"])
            grid._next_slot = ns
            grid._free_slots = [int(s) for s in z["free_slots"]]
            grid.block_map = {
                tuple(int(x) for x in c): int(s)
                for c, s in zip(z["coords"], z["slots"])
            }
            grid.frames_fused = int(z["frames_fused"])
            if ns:
                grid.pool = grid.pool.at[:ns].set(jnp.asarray(z["pool"]))
                if grid.with_color:
                    grid.color_pool = grid.color_pool.at[:ns].set(
                        jnp.asarray(z["color_pool"])
                    )
                    grid.weight_pool = grid.weight_pool.at[:ns].set(
                        jnp.asarray(z["weight_pool"])
                    )
            extra = json.loads(str(z["extra_json"]))
        return grid, extra

    @property
    def _block_extent(self) -> np.ndarray:
        """Block world extent per axis, (x, y, z) order."""
        return np.array(
            [self.block_shape[2], self.block_shape[1], self.block_shape[0]],
            np.float64,
        ) * self.voxel_size

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
        bs = self._block_extent
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

    def _allocated_in_frustum(
        self, view: DepthMapView
    ) -> list[tuple[int, int, int]]:
        """Already-allocated blocks that may project into `view`'s image.

        Conservative 8-corner test: a block is kept when any corner is in
        front of the camera and the projected corner bbox overlaps the
        image (blocks straddling the camera plane are always kept — their
        projection is unbounded). Over-inclusion is harmless: the
        integrate kernel computes a zero/invalid contribution per voxel."""
        if not self.block_map:
            return []
        coords = np.array(list(self.block_map.keys()), np.float64)  # (N, 3)
        bs = self._block_extent
        corner_off = np.array(
            list(itertools.product((0.0, 1.0), repeat=3)), np.float64
        )  # (8, 3)
        world = (coords[:, None, :] + corner_off[None, :, :]) * bs  # (N, 8, 3)
        p, cam_row = compose_projection(view.camera, None)
        hom = world @ p[:3, :3].T + p[:3, 3]  # (N, 8, 3)
        front = hom[..., 2] > 0
        any_front = front.any(axis=1)
        all_front = front.all(axis=1)
        z = np.where(front, hom[..., 2], 1.0)
        u = np.where(front, hom[..., 0] / z, 0.0)
        v = np.where(front, hom[..., 1] / z, 0.0)
        h, w = view.depth.shape
        big = 1e18
        u_lo = np.where(front, u, big).min(axis=1)
        u_hi = np.where(front, u, -big).max(axis=1)
        v_lo = np.where(front, v, big).min(axis=1)
        v_hi = np.where(front, v, -big).max(axis=1)
        overlaps = (u_hi >= -1) & (u_lo < w + 1) & (v_hi >= -1) & (v_lo < h + 1)
        keep = any_front & (overlaps | ~all_front)
        keys = list(self.block_map.keys())
        return [keys[i] for i in np.nonzero(keep)[0]]

    def _allocate(self, coords) -> np.ndarray:
        slots = []
        for c in coords:
            slot = self.block_map.get(c)
            if slot is None:
                if self._free_slots:
                    slot = self._free_slots.pop()
                elif self._next_slot < self.capacity:
                    slot = self._next_slot
                    self._next_slot += 1
                else:
                    raise RuntimeError(
                        f"sparse block pool exhausted (capacity {self.capacity})"
                    )
                self.block_map[c] = slot
            slots.append(slot)
        return np.asarray(slots, np.int32)

    def preallocate(self, views) -> int:
        """Allocate the truncation-band blocks of every view WITHOUT fusing.

        For a known trajectory this makes subsequent carved fusion EXACTLY
        equal to the dense path on allocated voxels (no late-allocation
        gap). Returns the number of allocated blocks."""
        for v in views:
            self._allocate(sorted(self._touched_blocks(v)))
        return self.num_allocated

    # -- eviction ------------------------------------------------------------

    def evict_blocks(self, coords) -> int:
        """Remove blocks; their pool slots are zeroed and recycled.

        A re-observed evicted block reallocates from zero (its history is
        gone) — the standard streaming trade-off; only evict blocks that
        are out of the working set or carry no surface (see
        :meth:`evict_deep_free_space`)."""
        slots = []
        for c in coords:
            slot = self.block_map.pop(tuple(c), None)
            if slot is not None:
                slots.append(slot)
                self._free_slots.append(slot)
        if slots:
            idx = jnp.asarray(np.asarray(slots))
            self.pool = self.pool.at[idx].set(0.0)
            if self.with_color:
                self.color_pool = self.color_pool.at[idx].set(0.0)
                self.weight_pool = self.weight_pool.at[idx].set(0.0)
        return len(slots)

    def evict_far_from(
        self, center_xyz, radius: float, keep_at_most: int | None = None
    ) -> int:
        """Spatial working-set eviction: evict blocks whose center lies
        farther than `radius` from `center_xyz` (e.g. the current camera
        position). With `keep_at_most`, additionally evict the farthest
        blocks until at most that many remain — the streaming block-budget
        policy for unbounded sequences. Returns evicted count."""
        if not self.block_map:
            return 0
        coords = np.array(list(self.block_map.keys()), np.float64)
        centers = (coords + 0.5) * self._block_extent
        dist = np.linalg.norm(
            centers - np.asarray(center_xyz, np.float64), axis=1
        )
        keys = list(self.block_map.keys())
        evict = [k for k, d in zip(keys, dist) if d > radius]
        if keep_at_most is not None:
            remaining = [
                (d, k) for k, d in zip(keys, dist) if d <= radius
            ]
            excess = len(remaining) - int(keep_at_most)
            if excess > 0:
                remaining.sort()
                evict.extend(k for _, k in remaining[-excess:])
        return self.evict_blocks(evict)

    def evict_deep_free_space(self, threshold: float | None = None) -> int:
        """Evict blocks whose every voxel is at or below `threshold`
        (deeply carved free space: no sign crossing can touch them).

        Default threshold: two full empty-space votes (-2*eta*rho)."""
        if threshold is None:
            threshold = -2.0 * self.params.eta * self.params.rho
        if not self.block_map:
            return 0
        pool = np.asarray(jax.device_get(self.pool))
        coords = [
            c
            for c, slot in self.block_map.items()
            if pool[slot].max() <= threshold
        ]
        return self.evict_blocks(coords)

    # -- fusion --------------------------------------------------------------

    def integrate_frame(
        self,
        view: DepthMapView,
        threshold_best_cost: float | None = None,
        carve: bool = True,
    ):
        """Fuse one RGB-D frame; allocates band blocks on the fly.

        carve=True (default, dense-parity behavior) also re-integrates every
        already-allocated block inside this frame's frustum, so blocks in
        the frame's free space receive the ``-eta*rho`` carve vote exactly
        like the dense kernel (``CudaReconstruction.cu:114-115``).
        carve=False restores band-only updates (cheaper; documented
        divergence from dense values in multi-viewpoint sequences)."""
        if threshold_best_cost is not None:
            view = view.thresholded(threshold_best_cost)
        band = self._touched_blocks(view)
        if not band and not (carve and self.block_map):
            return self
        coords_set = set(band)
        if carve:
            coords_set.update(self._allocated_in_frustum(view))
        if not coords_set:
            return self
        coords = sorted(coords_set)
        if self._use_pallas and len(coords) > 2:
            # Morton-order the touched blocks so consecutive gather tiles
            # (2 blocks per (8, 128) tile) are spatial neighbors with
            # compact image footprints. Block values are scatter-disjoint,
            # so ordering never affects results.
            from ..kernels.coloration_pallas import _morton_order

            order = _morton_order(np.array(coords, np.float64))
            coords = [coords[i] for i in order]
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
        origins = (np.array(coords, np.float64) * self._block_extent).astype(
            np.float32
        )
        p, cam_row = compose_projection(view.camera, None)
        proj_rows = np.vstack([p[:3, :], cam_row[None, :]]).astype(np.float32)
        h, w = view.depth.shape
        self.pool = _sparse_integrate(
            self.pool,
            jnp.asarray(slots),
            jnp.asarray(proj_rows),
            jnp.asarray(origins),
            jnp.asarray(self._axes),
            jnp.asarray(view.depth.astype(np.float32)),
            h=int(h), w=int(w),
            thick=float(self.params.thick), rho=float(self.params.rho),
            eta=float(self.params.eta), delta=float(self.params.delta),
            use_pallas=self._use_pallas,
        )
        if self.with_color and view.color is not None:
            self.color_pool, self.weight_pool = _sparse_accumulate_color(
                self.color_pool,
                self.weight_pool,
                jnp.asarray(slots),
                jnp.asarray(proj_rows),
                jnp.asarray(origins),
                jnp.asarray(self._axes),
                jnp.asarray(view.depth.astype(np.float32)),
                jnp.asarray(np.asarray(view.color, np.float32)),
                # Color band: the full truncation band, but at least ±1
                # voxel — with a narrower band the voxels flanking the
                # zero-crossing (where mesh vertices sample from) would
                # never receive color, and grazing-angle views (along-ray
                # distance >> Euclidean) would miss the surface entirely.
                h=int(h), w=int(w),
                band=float(max(self.params.delta, self.voxel_size)),
                use_pallas=self._use_pallas,
            )
        self.frames_fused += 1
        return self

    # -- extraction ----------------------------------------------------------

    def allocated_bounds(self):
        """((xmin, ymin, zmin), (xmax, ymax, zmax)) in block coords, or None."""
        if not self.block_map:
            return None
        arr = np.array(list(self.block_map.keys()))  # (N, 3) as (x, y, z)
        lo = arr.min(axis=0)
        hi = arr.max(axis=0)
        return lo, hi

    def _bbox_grid(self) -> VoxelGrid:
        """VoxelGrid of the allocated bounding box (the global key/coordinate
        domain for meshing and `to_dense`)."""
        lo, hi = self.allocated_bounds()
        nbx, nby, nbz = (hi - lo) + 1
        bz, by, bx = self.block_shape
        origin = (
            lo[0] * bx * self.voxel_size,
            lo[1] * by * self.voxel_size,
            lo[2] * bz * self.voxel_size,
        )
        return VoxelGrid(
            dims=(nbx * bx + 1, nby * by + 1, nbz * bz + 1),
            origin=origin,
            spacing=(self.voxel_size,) * 3,
        )

    def to_dense(self) -> tuple[np.ndarray, VoxelGrid]:
        """Materialize allocated blocks into a dense (cz, cy, cx) volume +
        its VoxelGrid (for parity tests / interop on SMALL scenes — memory
        is the bounding box; meshing does NOT use this, see extract_mesh).
        Unallocated space is 0."""
        bounds = self.allocated_bounds()
        if bounds is None:
            raise ValueError("no blocks allocated")
        lo, _ = bounds
        grid = self._bbox_grid()
        bz, by, bx = self.block_shape
        dense = np.zeros(grid.volume_shape, np.float32)
        pool = np.asarray(jax.device_get(self.pool))
        for (cx_, cy_, cz_), slot in self.block_map.items():
            iz = (cz_ - lo[2]) * bz
            iy = (cy_ - lo[1]) * by
            ix = (cx_ - lo[0]) * bx
            dense[iz : iz + bz, iy : iy + by, ix : ix + bx] = pool[slot]
        return dense, grid

    def extract_mesh(
        self,
        iso: float = 0.0,
        backend: str = "auto",
        compute_normals: bool = True,
    ) -> PolyData:
        """Per-block marching cubes: memory ∝ allocated blocks.

        Per block: its own cells + a 1-cell halo gathered from allocated
        neighbors; cell->point conversion averages ONLY allocated cells
        (matching ``vtkCellDataToPointData``'s existing-cells semantics at
        the data boundary, and preventing fabricated-zero crossing sheets
        at the allocation edge); triangles are emitted per owning cell
        exactly once; vertices weld across blocks by canonical global edge
        keys. Where a cell's full 27-neighborhood is allocated the point
        math is bit-identical to `to_dense()` + dense extraction (fp32
        averaging in the same add order)."""
        from .marching_cubes import _weld_triangle_soup, marching_cubes

        if not self.block_map:
            raise ValueError("no blocks allocated")
        lo, _ = self.allocated_bounds()
        grid = self._bbox_grid()
        nx, ny, nz = grid.point_shape[2], grid.point_shape[1], grid.point_shape[0]
        xs, ys, zs = grid.point_axes(np.float32)
        bz, by, bx = self.block_shape
        pool = np.asarray(jax.device_get(self.pool))

        # (bz+2, by+2, bx+2) halo source slices per neighbor offset.
        def _slices(d, n):
            if d < 0:
                return slice(n - 1, n), slice(0, 1)
            if d == 0:
                return slice(0, n), slice(1, n + 1)
            return slice(0, 1), slice(n + 1, n + 2)

        all_verts, all_keys = [], []
        npts_loc = (bx + 1) * (by + 1) * (bz + 1)
        for (cx_, cy_, cz_), slot in sorted(self.block_map.items()):
            cells = np.zeros((bz + 2, by + 2, bx + 2), np.float32)
            present = np.zeros((bz + 2, by + 2, bx + 2), bool)
            for dz, dy, dx in itertools.product((-1, 0, 1), repeat=3):
                nb = (
                    pool[slot]
                    if (dz, dy, dx) == (0, 0, 0)
                    else None
                )
                if nb is None:
                    ns = self.block_map.get((cx_ + dx, cy_ + dy, cz_ + dz))
                    if ns is None:
                        continue
                    nb = pool[ns]
                sz, tz_ = _slices(dz, bz)
                sy, ty_ = _slices(dy, by)
                sx, tx_ = _slices(dx, bx)
                cells[tz_, ty_, tx_] = nb[sz, sy, sx]
                present[tz_, ty_, tx_] = True

            # Masked cell->point averaging, fp32 adds in cell_to_point's
            # (dz, dy, dx) order so fully-allocated neighborhoods match the
            # dense path bit-for-bit.
            tot = np.zeros((bz + 1, by + 1, bx + 1), np.float32)
            cnt = np.zeros((bz + 1, by + 1, bx + 1), np.float32)
            for dz in (0, 1):
                for dy in (0, 1):
                    for dx in (0, 1):
                        tot = tot + cells[dz : dz + bz + 1, dy : dy + by + 1,
                                          dx : dx + bx + 1]
                        cnt = cnt + present[dz : dz + bz + 1, dy : dy + by + 1,
                                            dx : dx + bx + 1].astype(np.float32)
            pts = tot / np.maximum(cnt, 1.0)

            iz0 = (cz_ - lo[2]) * bz
            iy0 = (cy_ - lo[1]) * by
            ix0 = (cx_ - lo[0]) * bx
            sub = marching_cubes(
                pts, iso,
                xs[ix0 : ix0 + bx + 1],
                ys[iy0 : iy0 + by + 1],
                zs[iz0 : iz0 + bz + 1],
                matrix=None,
                backend=backend,
                _return_soup=True,
            )
            verts, keys = sub
            if len(keys) == 0:
                continue
            # Local edge keys -> global bbox-domain keys (same decomposition
            # as parallel/sharded_mesh.py's slab weld).
            axis = keys // npts_loc
            flat = keys % npts_loc
            kk = flat // ((bx + 1) * (by + 1)) + iz0
            rem = flat % ((bx + 1) * (by + 1))
            jj = rem // (bx + 1) + iy0
            ii = rem % (bx + 1) + ix0
            gkeys = axis * (nx * ny * nz) + (kk * ny + jj) * nx + ii
            all_verts.append(verts)
            all_keys.append(gkeys)

        if not all_verts:
            empty = PolyData(np.zeros((0, 3)), np.zeros((0, 3), np.int64))
            if compute_normals:  # attribute-set parity with non-empty
                empty.point_data["Normals"] = np.zeros((0, 3), np.float32)
            return empty
        mesh = _weld_triangle_soup(
            np.concatenate(all_verts), np.concatenate(all_keys), grid.matrix
        )
        if compute_normals:
            # Area-weighted winding normals (see ops/normals.py for why the
            # sparse path does not use gradient normals).
            from .normals import geometric_vertex_normals

            mesh.point_data["Normals"] = geometric_vertex_normals(
                mesh.points, mesh.triangles
            )
        return mesh

    # -- online color --------------------------------------------------------

    def vertex_colors(
        self, points: np.ndarray
    ) -> tuple[np.ndarray, np.ndarray]:
        """Per-point mean ONLINE color from the block color pool.

        Each point samples the nearest voxel center (mesh vertices lie on
        cell edges, so the nearest center is one of the edge's endpoint
        voxels — both inside the truncation band where color accumulates);
        if that voxel's block is unallocated or unobserved, its 6-neighbor
        voxels are tried (crossing block boundaries). Requires
        ``with_color=True``. Returns (mean_uint8 (N, 3), weight_f32 (N,))
        where weight is the accumulated proximity-falloff mass, with
        (0,0,0)/0 for never-observed points — the zero-hit convention of
        ``MeshColoration.cxx:113-133``."""
        if not self.with_color:
            raise ValueError("grid was built with with_color=False")
        pts = np.asarray(points, np.float64)
        n = len(pts)
        mean = np.zeros((n, 3), np.float64)
        count = np.zeros((n,), np.float32)
        if n == 0 or not self.block_map:
            return mean.astype(np.uint8), count
        color = np.asarray(jax.device_get(self.color_pool))
        weight = np.asarray(jax.device_get(self.weight_pool))
        bz, by, bx = self.block_shape
        bdims = np.array([bx, by, bz], np.int64)
        vox = np.floor(pts / self.voxel_size).astype(np.int64)  # (N, 3) xyz
        offs = np.array(
            [(0, 0, 0), (1, 0, 0), (-1, 0, 0), (0, 1, 0), (0, -1, 0),
             (0, 0, 1), (0, 0, -1)], np.int64
        )
        done = np.zeros(n, bool)
        for off in offs:
            todo = ~done
            if not todo.any():
                break
            v = vox[todo] + off
            bc = np.floor_divide(v, bdims)
            lc = v - bc * bdims  # (M, 3) within-block xyz
            slots = np.fromiter(
                (self.block_map.get(tuple(c), -1) for c in bc),
                np.int64, count=len(bc),
            )
            ok = slots >= 0
            if not ok.any():
                continue
            s = slots[ok]
            lz, ly, lx = lc[ok, 2], lc[ok, 1], lc[ok, 0]
            wgt = weight[s, lz, ly, lx]
            hit = wgt > 0
            idx = np.nonzero(todo)[0][ok][hit]
            mean[idx] = (
                color[s[hit], lz[hit], ly[hit], lx[hit]]
                / wgt[hit][:, None]
            )
            count[idx] = wgt[hit]
            done[idx] = True
        return np.clip(mean, 0, 255).astype(np.uint8), count

    def extract_colored_mesh(
        self, iso: float = 0.0, backend: str = "auto"
    ) -> PolyData:
        """:meth:`extract_mesh` + online vertex colors attached as
        ``MeanColoration`` / ``ColorWeight`` point arrays (ColorWeight is
        the accumulated proximity-falloff mass, not an integer count)."""
        mesh = self.extract_mesh(iso=iso, backend=backend)
        mean, wgt = self.vertex_colors(mesh.points)
        mesh.point_data["MeanColoration"] = mean
        mesh.point_data["ColorWeight"] = wgt.astype(np.float32)
        return mesh
