"""Command-line interfaces mirroring the reference executables."""

from . import colorize, reconstruct

__all__ = ["colorize", "reconstruct"]
