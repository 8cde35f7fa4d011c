"""Command-line interfaces mirroring the reference executables (+ RGB-D)."""

from . import colorize, fuse_rgbd, reconstruct

__all__ = ["colorize", "fuse_rgbd", "reconstruct"]
