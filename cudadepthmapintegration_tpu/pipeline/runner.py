"""Fault-tolerant, resumable fusion runner.

The reference aborts the whole job on any error (``gpuAssert`` calls
``exit()`` — ``CudaReconstruction.cu:68-76``). For long multi-host runs
(BASELINE north star: 1000 maps -> 1024^3) we instead exploit the algebra:
fusion is an order-independent SUM over views (``CudaReconstruction.cu:211``),
so work splits into idempotent view-range units. A failed unit is simply
re-fused; a crashed run resumes from its manifest + checkpoint.

Multi-host model: every host runs the same runner with (host_id, num_hosts);
units are statically striped across hosts; each host fuses only its units
into its (z-sharded) volume replica/partial, and partial volumes are summed
once at the end (or the grid is z-sharded with views replicated, needing no
sum at all — see parallel/sharded_integrate.py).
"""

from __future__ import annotations

import dataclasses
import json
import os
import time
from typing import Callable, Sequence

import numpy as np

from ..core.grid import VoxelGrid
from ..core.ray_potential import RayPotential
from ..utils.log import Log
from .checkpoint import FusionCheckpoint, load_checkpoint, save_checkpoint

__all__ = ["WorkUnit", "FaultTolerantRunner"]


@dataclasses.dataclass(frozen=True)
class WorkUnit:
    unit_id: int
    start: int  # first view index (inclusive)
    stop: int  # last view index (exclusive)


def _units_for(n_views: int, unit_size: int) -> list[WorkUnit]:
    return [
        WorkUnit(unit_id=i, start=s, stop=min(s + unit_size, n_views))
        for i, s in enumerate(range(0, n_views, unit_size))
    ]


class FaultTolerantRunner:
    """Runs fusion as retried, checkpointed, idempotent view-range units.

    `integrate_fn(volume_or_none, views) -> volume` applies one unit.
    """

    def __init__(
        self,
        grid: VoxelGrid,
        params: RayPotential,
        integrate_fn: Callable,
        unit_size: int = 32,
        max_retries: int = 3,
        checkpoint_path: str | None = None,
        checkpoint_every: int = 1,
        host_id: int = 0,
        num_hosts: int = 1,
        log: Log | None = None,
    ):
        self.grid = grid
        self.params = params
        self.integrate_fn = integrate_fn
        self.unit_size = int(unit_size)
        self.max_retries = int(max_retries)
        self.checkpoint_path = checkpoint_path
        self.checkpoint_every = int(checkpoint_every)
        self.host_id = int(host_id)
        self.num_hosts = int(num_hosts)
        self.log = log or Log()
        self.completed_units: set[int] = set()
        self.failed_units: list[int] = []

    # -- manifest ------------------------------------------------------------

    @property
    def _manifest_path(self) -> str | None:
        if self.checkpoint_path is None:
            return None
        return self.checkpoint_path + f".manifest.{self.host_id}.json"

    def _save_manifest(self) -> None:
        if self._manifest_path is None:
            return
        tmp = self._manifest_path + ".tmp"
        with open(tmp, "w") as f:
            json.dump(
                {
                    "completed_units": sorted(self.completed_units),
                    "host_id": self.host_id,
                    "num_hosts": self.num_hosts,
                    "unit_size": self.unit_size,
                },
                f,
            )
        os.replace(tmp, self._manifest_path)

    def _load_manifest(self) -> None:
        if self._manifest_path is None or not os.path.exists(self._manifest_path):
            return
        with open(self._manifest_path) as f:
            m = json.load(f)
        if m.get("unit_size") != self.unit_size or m.get("num_hosts") != self.num_hosts:
            self.log.info("manifest layout changed; restarting from scratch")
            return
        self.completed_units = set(m.get("completed_units", []))

    # -- run -----------------------------------------------------------------

    def _checkpoint(self, volume, n_views: int) -> None:
        by_id = {u.unit_id: u for u in _units_for(n_views, self.unit_size)}
        fused = sum(
            by_id[u].stop - by_id[u].start
            for u in self.completed_units
            if u in by_id
        )
        save_checkpoint(
            self.checkpoint_path,
            FusionCheckpoint(
                volume=np.asarray(volume),
                views_fused=fused,
                grid=self.grid,
                params=self.params,
            ),
        )
        self._save_manifest()

    def run(self, views: Sequence, resume: bool = True) -> np.ndarray:
        """Fuse this host's share of `views`; returns the host's volume."""
        volume = None
        if resume and self.checkpoint_path and os.path.exists(self.checkpoint_path):
            ckpt = load_checkpoint(self.checkpoint_path)
            if ckpt.matches(self.grid, self.params):
                volume = ckpt.volume
                self._load_manifest()
                self.log.info(
                    f"resumed: {len(self.completed_units)} units already fused"
                )
            else:
                self.log.info("checkpoint does not match configuration; ignoring")

        units = [
            u
            for u in _units_for(len(views), self.unit_size)
            if u.unit_id % self.num_hosts == self.host_id
            and u.unit_id not in self.completed_units
        ]
        done_since_ckpt = 0
        for unit in units:
            ok = False
            for attempt in range(self.max_retries):
                try:
                    batch = [views[i] for i in range(unit.start, unit.stop)]
                    volume = self.integrate_fn(volume, batch)
                    ok = True
                    break
                except Exception as e:  # unit is idempotent: safe to retry
                    self.log.always(
                        f"unit {unit.unit_id} attempt {attempt + 1} failed: {e}"
                    )
                    time.sleep(0.01 * (attempt + 1))
            if not ok:
                self.failed_units.append(unit.unit_id)
                continue
            self.completed_units.add(unit.unit_id)
            done_since_ckpt += 1
            if (
                self.checkpoint_path
                and done_since_ckpt >= self.checkpoint_every
            ):
                self._checkpoint(volume, len(views))
                done_since_ckpt = 0
        if self.checkpoint_path and done_since_ckpt:
            self._checkpoint(volume, len(views))
        if self.failed_units:
            self.log.always(
                f"WARNING: units failed after retries: {self.failed_units}"
            )
        if volume is None:
            volume = np.zeros(self.grid.volume_shape, np.float32)
        return np.asarray(volume)
