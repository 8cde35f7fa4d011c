"""Checkpoint/resume + streaming prefetch subsystems."""

import numpy as np
import pytest

from cudadepthmapintegration_tpu.core import RayPotential, VoxelGrid
from cudadepthmapintegration_tpu.ops import TSDFIntegrator
from cudadepthmapintegration_tpu.pipeline.checkpoint import (
    FusionCheckpoint,
    load_checkpoint,
    save_checkpoint,
)
from cudadepthmapintegration_tpu.pipeline.streaming import batched, prefetch_views
from cudadepthmapintegration_tpu.testing import sphere_scene

PARAMS = RayPotential(thick=0.1, rho=0.8, eta=0.03, delta=0.3)


def grid16():
    return VoxelGrid(dims=(17, 17, 17), origin=(-1.6,) * 3, spacing=(0.2,) * 3)


def test_checkpoint_roundtrip_and_resume(tmp_path):
    views = sphere_scene(n_views=6, width=64, height=48)
    grid = grid16()
    full = TSDFIntegrator(grid, PARAMS, dtype=np.float64).reset()
    full.integrate(views)

    half = TSDFIntegrator(grid, PARAMS, dtype=np.float64).reset()
    half.integrate(views[:3])
    path = str(tmp_path / "fusion.ckpt")
    save_checkpoint(
        path,
        FusionCheckpoint(
            volume=half.result(),
            views_fused=half.views_fused,
            grid=grid,
            params=PARAMS,
            fused_view_names=[v.name for v in views[:3]],
        ),
    )

    ckpt = load_checkpoint(path)
    assert ckpt.views_fused == 3
    assert len(ckpt.fused_view_names) == 3
    assert ckpt.matches(grid, PARAMS)
    assert not ckpt.matches(
        VoxelGrid(dims=(9, 9, 9), origin=(0,) * 3, spacing=(1,) * 3), PARAMS
    )

    resumed = TSDFIntegrator(grid, PARAMS, dtype=np.float64).reset(ckpt.volume)
    resumed.integrate(views[3:])
    np.testing.assert_allclose(resumed.result(), full.result(), atol=1e-12)


def test_checkpoint_atomic_overwrite(tmp_path):
    grid = grid16()
    path = str(tmp_path / "c.ckpt")
    for k in range(2):
        save_checkpoint(
            path,
            FusionCheckpoint(
                volume=np.full(grid.volume_shape, float(k)),
                views_fused=k,
                grid=grid,
                params=PARAMS,
            ),
        )
    ckpt = load_checkpoint(path)
    assert ckpt.views_fused == 1
    assert ckpt.volume[0, 0, 0] == 1.0


class _CountingDataset:
    """Sequence that records per-item load order / thread usage."""

    def __init__(self, n, fail_at=None):
        self.n = n
        self.fail_at = fail_at

    def __len__(self):
        return self.n

    def __getitem__(self, i):
        if i == self.fail_at:
            raise OSError(f"bad view {i}")
        return i * 10


def test_prefetch_preserves_order():
    got = list(prefetch_views(_CountingDataset(37), prefetch=4, num_threads=3))
    assert got == [i * 10 for i in range(37)]


def test_prefetch_propagates_errors_in_order():
    it = prefetch_views(_CountingDataset(10, fail_at=5), prefetch=3, num_threads=2)
    got = []
    with pytest.raises(OSError, match="bad view 5"):
        for x in it:
            got.append(x)
    assert got == [0, 10, 20, 30, 40]


def test_prefetch_empty():
    assert list(prefetch_views(_CountingDataset(0))) == []


def test_batched():
    assert list(batched(range(7), 3)) == [[0, 1, 2], [3, 4, 5], [6]]
    assert list(batched([], 3)) == []
