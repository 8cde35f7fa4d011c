"""The bench record must survive the failure modes that erased round 3's.

Round 3's ``BENCH_r03.json`` was ``rc=124, parsed=null``: the process hung
at the first device op (wedged tunnel relay — the listener stays up, so the
socket probe passes) and the single end-of-run ``print`` never ran. These
tests drive ``bench.py`` as a subprocess through both hardening paths:

* WATCHDOG: a simulated never-returning device op (``BENCH_SIMULATE_WEDGE``)
  must still yield the one JSON line (with an ``error`` field) and exit 2.
* DEADLINE: ``BENCH_DEADLINE_S=0`` must truncate every phase and emit the
  JSON with the ``truncated`` list instead of running for minutes.

Both run on the CPU platform (``BENCH_FORCE_CPU=1`` — an in-process config
update; the env var alone is too late because sitecustomize imports jax
first, see CLAUDE.md) so no TPU/tunnel is touched.
"""

import json
import os
import subprocess
import sys

import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
BENCH = os.path.join(REPO, "bench.py")


def _run_bench(extra_env, timeout):
    env = dict(os.environ)
    env.update(extra_env)
    env["BENCH_FORCE_CPU"] = "1"
    return subprocess.run(
        [sys.executable, BENCH],
        capture_output=True, text=True, timeout=timeout, env=env, cwd=REPO,
    )


def _parse_single_json_line(stdout):
    lines = [ln for ln in stdout.splitlines() if ln.strip()]
    assert len(lines) == 1, f"expected exactly one stdout line, got {lines!r}"
    return json.loads(lines[0])


def test_watchdog_emits_partial_record_on_wedge():
    # Stall threshold far below the default 420 s so the test is quick; the
    # simulated wedge fires before any compile, so ~imports + watchdog tick.
    proc = _run_bench({"BENCH_SIMULATE_WEDGE": "1", "BENCH_STALL_S": "8"},
                      timeout=150)
    rec = _parse_single_json_line(proc.stdout)
    assert proc.returncode == 2
    assert rec["metric"] == "tsdf_voxel_updates_per_sec_512cube_32views"
    assert rec["unit"] == "voxel_updates/s"
    assert "device wedge" in rec["error"]
    assert "pallas_512" in rec["error"]  # names the wedged phase
    # Forensics on stderr: the phase-start line must precede the hang.
    assert "phase pallas_512 start" in proc.stderr
    assert "WATCHDOG" in proc.stderr


def test_deadline_truncates_and_still_emits():
    proc = _run_bench({"BENCH_DEADLINE_S": "0"}, timeout=150)
    rec = _parse_single_json_line(proc.stdout)
    # No phase ran: headline value is honest zero, rc signals incomplete.
    assert proc.returncode == 1
    assert rec["value"] == 0
    assert rec["truncated"][0] == "pallas_512"
    assert len(rec["truncated"]) == 9  # every phase listed, none silently lost


def test_first_op_stall_budget_spares_slow_warmup():
    """A slow first device op (round-5: 886 s session setup observed) must
    NOT be declared a wedge: the warm-up runs under STALL_FIRST_S, the
    watchdog threshold drops to BENCH_STALL_S only afterwards, and the
    phase deadline clock starts post-warm-up. Simulated: warm-up sleeps
    8 s with a 4 s wedge threshold — old behavior would emit the wedge
    record; now the run proceeds to the (deadline-0-truncated) exit."""
    proc = _run_bench(
        {"BENCH_SIMULATE_SLOW_WARMUP": "8", "BENCH_STALL_S": "4",
         "BENCH_STALL_FIRST_S": "60", "BENCH_DEADLINE_S": "0"},
        timeout=150,
    )
    rec = _parse_single_json_line(proc.stdout)
    assert proc.returncode == 1  # truncated-everything exit, NOT wedge rc=2
    assert "error" not in rec
    assert rec["truncated"][0] == "pallas_512"
    assert "device warm-up op done" in proc.stderr
