"""Fault-tolerant runner: retries, resume, multi-host striping."""

import numpy as np
import pytest

from cudadepthmapintegration_tpu.core import RayPotential, VoxelGrid
from cudadepthmapintegration_tpu.ops import TSDFIntegrator, integrate_views_oracle
from cudadepthmapintegration_tpu.pipeline.runner import (
    FaultTolerantRunner,
    FusionUnitError,
)
from cudadepthmapintegration_tpu.testing import sphere_scene

PARAMS = RayPotential(thick=0.1, rho=0.8, eta=0.03, delta=0.3)


def grid16():
    return VoxelGrid(dims=(17, 17, 17), origin=(-1.6,) * 3, spacing=(0.2,) * 3)


def make_integrate_fn(grid, flaky_failures=0):
    state = {"fails_left": flaky_failures}

    def integrate_fn(volume, batch):
        if state["fails_left"] > 0:
            state["fails_left"] -= 1
            raise RuntimeError("injected transient failure")
        integ = TSDFIntegrator(grid, PARAMS, dtype=np.float64).reset(volume)
        integ.integrate(batch)
        return integ.result()

    return integrate_fn


def test_runner_fuses_everything():
    views = sphere_scene(n_views=7, width=64, height=48)
    grid = grid16()
    runner = FaultTolerantRunner(grid, PARAMS, make_integrate_fn(grid), unit_size=2)
    vol = runner.run(views)
    exp = integrate_views_oracle(grid, views, PARAMS)
    np.testing.assert_allclose(vol, exp, atol=1e-9)
    assert not runner.failed_units


def test_runner_retries_transient_failures():
    views = sphere_scene(n_views=4, width=64, height=48)
    grid = grid16()
    runner = FaultTolerantRunner(
        grid, PARAMS, make_integrate_fn(grid, flaky_failures=2), unit_size=2
    )
    vol = runner.run(views)
    exp = integrate_views_oracle(grid, views, PARAMS)
    np.testing.assert_allclose(vol, exp, atol=1e-9)
    assert not runner.failed_units


def test_runner_raises_on_permanent_failures_by_default():
    views = sphere_scene(n_views=4, width=64, height=48)
    grid = grid16()

    def always_fail(volume, batch):
        raise RuntimeError("broken")

    runner = FaultTolerantRunner(
        grid, PARAMS, always_fail, unit_size=2, max_retries=2
    )
    with pytest.raises(FusionUnitError) as exc:
        runner.run(views)
    assert sorted(exc.value.failed_units) == [0, 1]


def test_runner_partial_mode_reports_permanent_failures():
    views = sphere_scene(n_views=4, width=64, height=48)
    grid = grid16()

    def always_fail(volume, batch):
        raise RuntimeError("broken")

    runner = FaultTolerantRunner(
        grid, PARAMS, always_fail, unit_size=2, max_retries=2,
        on_failure="partial",
    )
    runner.run(views)
    assert sorted(runner.failed_units) == [0, 1]


def test_runner_retry_restarts_from_snapshot():
    """A unit that mutates the volume in place and THEN fails must not
    leak its partial accumulation into the retry (non-atomic integrate_fn)."""
    views = sphere_scene(n_views=4, width=64, height=48)
    grid = grid16()
    inner = make_integrate_fn(grid)
    state = {"sabotage": 1}

    def dirty_then_fail(volume, batch):
        if state["sabotage"] > 0:
            state["sabotage"] -= 1
            if volume is not None:
                volume += 123.0  # partial, wrong accumulation
            raise RuntimeError("died mid-unit")
        return inner(volume, batch)

    runner = FaultTolerantRunner(
        grid, PARAMS, dirty_then_fail, unit_size=2, max_retries=3
    )
    vol = runner.run(views)
    exp = integrate_views_oracle(grid, views, PARAMS)
    np.testing.assert_allclose(vol, exp, atol=1e-9)


def test_runner_layout_change_discards_checkpoint(tmp_path):
    """Same checkpoint path, different unit_size: the volume must NOT be
    restored with empty bookkeeping (that double-fuses every view)."""
    views = sphere_scene(n_views=8, width=64, height=48)
    grid = grid16()
    ckpt = str(tmp_path / "run.ckpt")
    r1 = FaultTolerantRunner(
        grid, PARAMS, make_integrate_fn(grid), unit_size=2,
        checkpoint_path=ckpt,
    )
    r1.run(views)
    r2 = FaultTolerantRunner(
        grid, PARAMS, make_integrate_fn(grid), unit_size=4,
        checkpoint_path=ckpt,
    )
    vol = r2.run(views)  # resumes -> layout mismatch -> clean restart
    exp = integrate_views_oracle(grid, views, PARAMS)
    np.testing.assert_allclose(vol, exp, atol=1e-9)


def test_runner_multi_host_checkpoint_paths_are_distinct(tmp_path):
    views = sphere_scene(n_views=8, width=64, height=48)
    grid = grid16()
    ckpt = str(tmp_path / "run.ckpt")
    partials = []
    for host in range(2):
        r = FaultTolerantRunner(
            grid, PARAMS, make_integrate_fn(grid), unit_size=2,
            host_id=host, num_hosts=2, checkpoint_path=ckpt,
        )
        assert r.checkpoint_path == f"{ckpt}.h{host}"
        partials.append(r.run(views))
    assert (tmp_path / "run.ckpt.h0").exists()
    assert (tmp_path / "run.ckpt.h1").exists()
    combined = partials[0] + partials[1]
    exp = integrate_views_oracle(grid, views, PARAMS)
    np.testing.assert_allclose(combined, exp, atol=1e-9)


def test_runner_resume_from_checkpoint(tmp_path):
    views = sphere_scene(n_views=8, width=64, height=48)
    grid = grid16()
    ckpt = str(tmp_path / "run.ckpt")

    # First run crashes partway: fail permanently on unit 2+.
    calls = {"n": 0}

    def crashy(volume, batch):
        calls["n"] += 1
        if calls["n"] > 2:
            raise RuntimeError("host died")
        return make_integrate_fn(grid)(volume, batch)

    r1 = FaultTolerantRunner(
        grid, PARAMS, crashy, unit_size=2, max_retries=1, checkpoint_path=ckpt
    )
    with pytest.raises(FusionUnitError):
        r1.run(views)
    assert len(r1.completed_units) == 2

    # Second run resumes and completes only the remaining units.
    seen_batches = []

    def tracking(volume, batch):
        seen_batches.append(len(batch))
        return make_integrate_fn(grid)(volume, batch)

    r2 = FaultTolerantRunner(
        grid, PARAMS, tracking, unit_size=2, checkpoint_path=ckpt
    )
    vol = r2.run(views)
    assert len(seen_batches) == 2  # only units 2 and 3 re-ran
    exp = integrate_views_oracle(grid, views, PARAMS)
    np.testing.assert_allclose(vol, exp, atol=1e-9)


def test_runner_multi_host_striping_sums_to_full():
    views = sphere_scene(n_views=8, width=64, height=48)
    grid = grid16()
    partials = []
    for host in range(2):
        r = FaultTolerantRunner(
            grid, PARAMS, make_integrate_fn(grid), unit_size=2,
            host_id=host, num_hosts=2,
        )
        partials.append(r.run(views))
    combined = partials[0] + partials[1]
    exp = integrate_views_oracle(grid, views, PARAMS)
    np.testing.assert_allclose(combined, exp, atol=1e-9)


def test_runner_fails_fast_on_programming_errors(tmp_path):
    """A TypeError in integrate_fn must surface on attempt 1 (no retries),
    with completed progress checkpointed for a fixed rerun."""
    views = sphere_scene(n_views=4, width=64, height=48)
    grid = grid16()
    calls = {"n": 0}
    good = make_integrate_fn(grid)

    def integrate_fn(volume, batch):
        calls["n"] += 1
        if calls["n"] >= 2:  # unit 0 succeeds; unit 1 hits the bug
            raise TypeError("integrate_fn() got an unexpected keyword")
        return good(volume, batch)

    ckpt = str(tmp_path / "ft.ckpt")
    runner = FaultTolerantRunner(
        grid, PARAMS, integrate_fn, unit_size=2, checkpoint_path=ckpt
    )
    with pytest.raises(TypeError):
        runner.run(views)
    assert calls["n"] == 2  # exactly one attempt of the buggy unit

    # The completed unit was checkpointed; a fixed rerun resumes past it.
    calls2 = {"n": 0}

    def fixed_fn(volume, batch):
        calls2["n"] += 1
        return good(volume, batch)

    runner2 = FaultTolerantRunner(
        grid, PARAMS, fixed_fn, unit_size=2, checkpoint_path=ckpt
    )
    vol = runner2.run(views)
    assert calls2["n"] == 1  # only the failed unit re-fused
    exp = integrate_views_oracle(grid, views, PARAMS)
    np.testing.assert_allclose(vol, exp, atol=1e-9)
