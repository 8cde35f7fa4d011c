"""Multi-device parallelism: mesh, sharded fusion, halo exchange, coloration."""

from . import distributed
from .halo import exchange_z_halo, sharded_cell_to_point
from .mesh import make_mesh
from .sharded_coloration import sharded_colorize_points
from .sharded_integrate import ShardedTSDFIntegrator
from .sharded_mesh import sharded_extract_isosurface

__all__ = [
    "ShardedTSDFIntegrator",
    "distributed",
    "exchange_z_halo",
    "make_mesh",
    "sharded_cell_to_point",
    "sharded_colorize_points",
    "sharded_extract_isosurface",
]
