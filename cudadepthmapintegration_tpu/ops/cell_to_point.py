"""Cell-data -> point-data averaging.

Equivalent of ``vtkCellDataToPointData`` as used at
``Reconstruction/main.cxx:150-155``: each grid point receives the arithmetic
mean of the values of the (1..8) cells incident to it. Implemented as eight
shifted slice-adds of a zero-padded volume — a fused, gather-free XLA pattern.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

__all__ = ["cell_to_point"]


@jax.jit
def cell_to_point(cell_volume: jax.Array) -> jax.Array:
    """(cz, cy, cx) cell scalars -> (cz+1, cy+1, cx+1) point scalars."""
    v = jnp.pad(cell_volume, 1)
    ones = jnp.pad(jnp.ones_like(cell_volume), 1)
    pz, py, px = cell_volume.shape[0] + 1, cell_volume.shape[1] + 1, cell_volume.shape[2] + 1
    total = jnp.zeros((pz, py, px), cell_volume.dtype)
    count = jnp.zeros((pz, py, px), cell_volume.dtype)
    for dz in (0, 1):
        for dy in (0, 1):
            for dx in (0, 1):
                total = total + jax.lax.dynamic_slice(v, (dz, dy, dx), (pz, py, px))
                count = count + jax.lax.dynamic_slice(ones, (dz, dy, dx), (pz, py, px))
    return total / count
