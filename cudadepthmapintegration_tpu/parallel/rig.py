"""Rig-aware shard-axis selection.

The z-slab decomposition (`ShardedTSDFIntegrator`) pins the Pallas
kernel's grid-step (k) axis to the sharded volume axis. Measured on
hardware (docs/SCALING.md): when cameras look ACROSS the sharded axis
the pinned k costs nothing, but a rig looking ALONG it (top-down ring
over a z-sharded grid) loses ~22% — `best_axis_permutation` wants the
viewing direction on the SUBLANE axis, which the sharding forbids.

The fix is geometric, not kernel work: relabel the grid's axes so grid-z
becomes the axis the cameras look along LEAST, fuse on the relabeled
grid, and transpose the fused volume back. The relabeling is an exact
permutation (the grid matrix absorbs a 0/1 column permutation; origins
and spacings are reordered), so the fused volume is bit-identical to
fusing on the original grid — only the memory layout (and therefore the
shard axis) changes.

Replaces nothing in the reference (`Reconstruction/CudaReconstruction.cu`
is single-GPU and layout-fixed); this is scale-out machinery.
"""

from __future__ import annotations

import numpy as np

from ..core.grid import VoxelGrid

__all__ = [
    "best_shard_grid_axis",
    "permute_grid_axes",
    "permute_volume",
    "unpermute_volume",
    "grid_for_sharding",
]


def best_shard_grid_axis(grid: VoxelGrid, views) -> int:
    """Grid axis (0=x, 1=y, 2=z) the cameras look along LEAST.

    Scores each grid-frame axis by the summed |view-direction| component
    over the rig (row 2 of ``RT @ grid_matrix`` is the camera's viewing
    direction expressed in grid coordinates, cf.
    ``kernels.integrate_pallas.best_axis_permutation``) and returns the
    argmin — the axis whose pinning to the kernel's k step hurts least.
    """
    score = np.zeros(3, dtype=np.float64)
    for v in views:
        rot = (v.camera.rt @ grid.matrix)[:3, :3]
        score += np.abs(rot[2])
    return int(np.argmin(score))


def permute_grid_axes(grid: VoxelGrid, perm: tuple[int, int, int]) -> VoxelGrid:
    """Relabel grid axes: new grid axis ``i`` is old grid axis ``perm[i]``.

    Voxel-center world positions are preserved EXACTLY: the new matrix is
    ``matrix @ P`` where ``P`` is the 0/1 permutation taking new-frame
    coordinates to old-frame coordinates, and dims/origin/spacing are
    reordered — no floating-point arithmetic is introduced, so fusion on
    the permuted grid is bit-identical to the original modulo layout.
    """
    if sorted(perm) != [0, 1, 2]:
        raise ValueError(f"perm must be a permutation of (0, 1, 2), got {perm}")
    p4 = np.zeros((4, 4), dtype=np.float64)
    for new_ax, old_ax in enumerate(perm):
        p4[old_ax, new_ax] = 1.0
    p4[3, 3] = 1.0
    return VoxelGrid(
        dims=tuple(grid.dims[a] for a in perm),
        origin=tuple(grid.origin[a] for a in perm),
        spacing=tuple(grid.spacing[a] for a in perm),
        matrix=grid.matrix @ p4,
    )


def permute_volume(volume, perm: tuple[int, int, int]):
    """Transpose a canonical (z, y, x) volume into the layout of the grid
    permuted by ``perm`` (inverse of :func:`unpermute_volume`) — e.g. to
    seed a resume volume into a permuted-grid integrator."""
    # New volume axis i holds old grid axis perm[2-i]; the original volume
    # keeps old grid axis a on volume axis 2-a.
    order = tuple(2 - perm[2 - i] for i in range(3))
    return volume.transpose(order)


def unpermute_volume(volume, perm: tuple[int, int, int]):
    """Transpose a (z', y', x') volume fused on the permuted grid back to
    the original grid's canonical (z, y, x) layout.

    Works on numpy or jax arrays (plain transpose — on device it is a
    layout change XLA handles without host traffic).
    """
    # Volume axis v holds grid axis 2-v; new volume axis i holds old grid
    # axis perm[2-i]. Original volume axis j needs old grid axis 2-j.
    inv = [0, 0, 0]
    for new_ax, old_ax in enumerate(perm):
        inv[old_ax] = new_ax
    order = tuple(2 - inv[2 - j] for j in range(3))
    return volume.transpose(order)


def grid_for_sharding(
    grid: VoxelGrid, views
) -> tuple[VoxelGrid, tuple[int, int, int]]:
    """Relabeled grid whose z axis is the rig's least-looked-along axis.

    Returns ``(permuted_grid, perm)``; fuse/shard on ``permuted_grid``
    (z-slab sharding now cuts the friendly axis) and map results back
    with ``unpermute_volume(vol, perm)``. If z is already optimal the
    grid is returned unchanged with the identity perm.
    """
    axis = best_shard_grid_axis(grid, views)
    if axis == 2:
        return grid, (0, 1, 2)
    # Swap the chosen axis with z; keep the other two in order.
    perm = [0, 1, 2]
    perm[axis], perm[2] = perm[2], perm[axis]
    perm = tuple(perm)
    return permute_grid_axes(grid, perm), perm
