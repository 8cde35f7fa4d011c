"""High-level pipelines: reconstruction, coloration, checkpointing."""

from .checkpoint import FusionCheckpoint, load_checkpoint, save_checkpoint
from .coloration import ColorationConfig, ColorationPipeline
from .filter import ReconstructionFilter
from .reconstruction import (
    ReconstructionConfig,
    ReconstructionPipeline,
    ReconstructionResult,
)
from .runner import FaultTolerantRunner, WorkUnit
from .streaming import batched, prefetch_views

__all__ = [
    "ColorationConfig",
    "ColorationPipeline",
    "FaultTolerantRunner",
    "FusionCheckpoint",
    "ReconstructionFilter",
    "ReconstructionConfig",
    "ReconstructionPipeline",
    "ReconstructionResult",
    "WorkUnit",
    "batched",
    "load_checkpoint",
    "prefetch_views",
    "save_checkpoint",
]
