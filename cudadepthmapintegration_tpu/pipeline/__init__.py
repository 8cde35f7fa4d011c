"""High-level pipelines: reconstruction, coloration, checkpointing."""

from .coloration import ColorationConfig, ColorationPipeline
from .reconstruction import (
    ReconstructionConfig,
    ReconstructionPipeline,
    ReconstructionResult,
)

__all__ = [
    "ColorationConfig",
    "ColorationPipeline",
    "ReconstructionConfig",
    "ReconstructionPipeline",
    "ReconstructionResult",
]
