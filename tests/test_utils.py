"""Logging + profiling utilities."""

import io
import json

from cudadepthmapintegration_tpu.utils import FusionMetrics, Log


def test_log_verbose_gating():
    buf = io.StringIO()
    log = Log(verbose=False, stream=buf)
    log.info("hidden")
    log.always("shown")
    assert "hidden" not in buf.getvalue()
    assert "shown" in buf.getvalue()
    vbuf = io.StringIO()
    vlog = Log(verbose=True, stream=vbuf)
    vlog.info("now visible")
    assert "now visible" in vbuf.getvalue()


def test_log_phase_timing():
    log = Log(verbose=False)
    with log.phase("fuse"):
        pass
    with log.phase("fuse"):
        pass
    assert log.timings["fuse"] >= 0
    assert len(log.timings) == 1  # accumulated, not duplicated


def test_fusion_metrics_report():
    m = FusionMetrics(chip="v5e")
    m.seconds = 2.0
    m.add_fusion(num_cells=1000, num_views=50, passes=2)
    rep = m.report()
    assert rep["voxel_updates_per_sec"] == 1000 * 50 / 2.0
    assert rep["views_per_sec"] == 25.0
    assert 0 < rep["hbm_roofline_fraction"] < 1
    json.loads(m.json())  # serializable


def test_fusion_metrics_start_stop():
    m = FusionMetrics()
    m.start()
    m.stop()
    assert m.seconds >= 0
    assert m.voxel_updates_per_sec == 0.0  # no voxels recorded


def test_profiler_trace_writes_output(tmp_path):
    import jax.numpy as jnp

    from cudadepthmapintegration_tpu.utils import trace

    d = str(tmp_path / "trace")
    with trace(d):
        jnp.ones((8, 8)).sum().block_until_ready()
    import os

    # jax.profiler writes a plugins/profile tree under the log dir.
    found = []
    for root, dirs, files in os.walk(d):
        found.extend(files)
    assert found  # something was captured
