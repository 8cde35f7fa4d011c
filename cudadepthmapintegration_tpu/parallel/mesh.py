"""Device-mesh construction for multi-chip / multi-host fusion.

The reference is strictly single-GPU (one CUDA kernel, sequential view loop —
``Reconstruction/CudaReconstruction.cu:330-331,343``). Here scaling is
expressed the JAX way: a named :class:`jax.sharding.Mesh` over all devices,
`NamedSharding` annotations, and XLA-inserted collectives (SURVEY.md section 2
"Parallelism-strategy inventory").

Axes:
  * ``z``  — spatial parallelism: the voxel grid is sharded in z-slabs; each
    device integrates EVERY view against only its own slab, so fusion needs
    **no** grid collectives at all (the loop-nest inversion of SURVEY 7.4).
  * ``v``  — view/data parallelism: views are sharded and partial volumes
    are ``psum``-reduced; useful when the grid is small and views are many.
"""

from __future__ import annotations

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec

__all__ = ["make_mesh", "NamedSharding", "PartitionSpec"]


def make_mesh(
    n_z: int | None = None,
    n_v: int = 1,
    devices=None,
) -> Mesh:
    """Build a (z, v) mesh. Defaults to all devices on the z axis."""
    devices = list(devices if devices is not None else jax.devices())
    if n_z is None:
        n_z = len(devices) // n_v
    if n_z * n_v > len(devices):
        raise ValueError(
            f"mesh {n_z}x{n_v} needs {n_z * n_v} devices, have {len(devices)}"
        )
    arr = np.array(devices[: n_z * n_v]).reshape(n_z, n_v)
    return Mesh(arr, axis_names=("z", "v"))
