"""Compute ops: TSDF integration, marching cubes, coloration."""

from .integrate import ProjectionTables, TSDFIntegrator, projection_tables
from .oracle import integrate_views_oracle

__all__ = [
    "ProjectionTables",
    "TSDFIntegrator",
    "integrate_views_oracle",
    "projection_tables",
]
