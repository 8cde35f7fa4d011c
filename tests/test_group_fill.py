"""Cross-batch orientation-group filling (TSDFIntegrator group_fill).

Round-5 fix for the streamed-regime padding tax (VERDICT r4 item 2): the
CLI streaming loop used to build one OrientedFusionPlan per stream batch,
padding each orientation group to a multiple of 8 with dummy views whose
kernel steps are 100% dead. group_fill buffers views per orientation group
ACROSS integrate() calls and only runs full chunks; leftovers flush
(padded) once at result().

The load-bearing property pinned here: the Pallas kernel accumulates into
the volume block sequentially per view, so splitting one orientation
group's view sequence across multiple kernel calls is BIT-identical to a
single call over the same sequence. That is what makes the flush chunk
size a pure performance knob.
"""

import numpy as np
import pytest

import cudadepthmapintegration_tpu.kernels.integrate_pallas as KP
from cudadepthmapintegration_tpu.core import RayPotential, VoxelGrid
from cudadepthmapintegration_tpu.ops import TSDFIntegrator, integrate_views_oracle
from cudadepthmapintegration_tpu.testing import (
    look_at_camera,
    render_sphere_view,
    sphere_scene,
)

KP.INTERPRET = True

PARAMS = RayPotential(thick=0.1, rho=0.8, eta=0.03, delta=0.3)


def small_grid(dims=(17, 17, 17)):
    return VoxelGrid(dims=dims, origin=(-1.6, -1.6, -1.6), spacing=(0.2, 0.2, 0.2))


def same_perm_views(n, width=96, height=48):
    """n views whose cameras share one dominant axis permutation (all eyes
    on the -y side, small jitter), so they land in ONE orientation group."""
    rng = np.random.default_rng(11)
    views = []
    for _ in range(n):
        eye = (float(rng.uniform(-0.5, 0.5)), -4.0 + float(rng.uniform(-0.3, 0.3)),
               float(rng.uniform(-0.5, 0.5)))
        cam = look_at_camera(eye, (0.0, 0.0, 0.0), focal=55.0,
                             width=width, height=height)
        views.append(render_sphere_view(cam, width, height))
    perms = {
        KP.best_axis_permutation((v.camera.rt @ np.eye(4))[:3, :3])
        for v in views
    }
    assert len(perms) == 1, f"fixture broke: {perms}"
    return views


def test_chunked_group_calls_bit_identical():
    # One 16-view group call vs two 8-view calls over the same sequence.
    views = same_perm_views(16)
    grid = small_grid()
    one = (
        TSDFIntegrator(grid, PARAMS, backend="pallas", group_fill=0)
        .reset()
        .integrate(views)
        .result()
    )
    chunked = TSDFIntegrator(grid, PARAMS, backend="pallas", group_fill=8).reset()
    for s in range(0, 16, 4):
        chunked.integrate(views[s : s + 4])
    assert not chunked._pending  # 16 = 2 full chunks: nothing left over
    np.testing.assert_array_equal(chunked.result(), one)


def test_group_fill_streamed_matches_oracle():
    # Mixed-orientation orbit streamed in odd-size batches; leftovers flush
    # at result(). Values gate vs the fp64 oracle.
    views = sphere_scene(n_views=10, width=96, height=48, focal=50.0)
    grid = small_grid()
    integ = TSDFIntegrator(grid, PARAMS, backend="pallas", group_fill=8).reset()
    for s in range(0, 10, 3):
        integ.integrate(views[s : s + 3])
    got = integ.result()
    assert integ.views_fused == 10
    exp = integrate_views_oracle(grid, views, PARAMS)
    assert (np.abs(got - exp.astype(np.float32)) > 1e-3).mean() == 0.0
    assert exp.max() > 0.5  # the scene actually hit the grid


def test_group_fill_flush_idempotent_and_reset_clears():
    views = same_perm_views(5)
    grid = small_grid()
    integ = TSDFIntegrator(grid, PARAMS, backend="pallas", group_fill=8).reset()
    integ.integrate(views)
    assert sum(len(b) for b in integ._pending.values()) == 5
    a = integ.result()  # flushes
    assert not integ._pending
    b = integ.result()  # second result(): no pending work, same bits
    np.testing.assert_array_equal(a, b)
    integ.integrate(views[:2])
    integ.reset()
    assert not integ._pending  # reset drops buffered views with the volume


def test_group_fill_validation():
    with pytest.raises(ValueError, match="multiple of 8"):
        TSDFIntegrator(small_grid(), PARAMS, backend="pallas", group_fill=12)


def test_group_fill_default_on_for_pallas():
    assert TSDFIntegrator(small_grid(), PARAMS, backend="pallas").group_fill == 32
    assert TSDFIntegrator(small_grid(), PARAMS).group_fill == 0


def test_pipeline_config_passthrough():
    from cudadepthmapintegration_tpu.pipeline.reconstruction import (
        ReconstructionConfig,
        ReconstructionPipeline,
    )

    cfg = ReconstructionConfig(
        grid_dims=(9, 9, 9), grid_spacing=(0.4, 0.4, 0.4),
        grid_origin=(-1.6, -1.6, -1.6), ray_thick=0.1,
        backend="pallas", group_fill=8, write_mha_path=None,
    )
    pipe = ReconstructionPipeline(cfg)
    views = sphere_scene(n_views=3, width=96, height=48, focal=50.0)
    integ, _ = pipe.fuse(views)
    assert integ.group_fill == 8
    assert not integ._pending  # fuse() ends with result(): buffers flushed
    assert integ.views_fused == 3
