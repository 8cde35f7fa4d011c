"""2-process multi-host smoke test (real OS processes, real jax.distributed).

Phase A ("crash"): two worker processes stripe 4 units across 2 hosts;
host 1 is preempted (os._exit) after finishing one unit, host 0 completes.
Phase B ("resume"): two workers join a genuine ``jax.distributed`` CPU
runtime, resume from their per-host checkpoints (host 1 re-fuses only its
unfinished unit), and reduce the partial volumes with
``parallel.distributed.all_sum_volume``. The summed volume must equal the
full-scene oracle — the replica-mode contract of pipeline/runner.py.
"""

import os
import socket
import subprocess
import sys

import numpy as np

from cudadepthmapintegration_tpu.core import RayPotential, VoxelGrid
from cudadepthmapintegration_tpu.ops import integrate_views_oracle
from cudadepthmapintegration_tpu.testing import sphere_scene

PARAMS = RayPotential(thick=0.1, rho=0.8, eta=0.03, delta=0.3)
WORKER = os.path.join(os.path.dirname(__file__), "_mh_worker.py")


def _spawn(role, proc, out_dir, coord=None):
    env = dict(os.environ)
    env.update(
        MH_ROLE=role,
        MH_PROC=str(proc),
        MH_DIR=str(out_dir),
        JAX_PLATFORMS="cpu",
    )
    env.pop("XLA_FLAGS", None)
    if coord:
        env["MH_COORD"] = coord
    return subprocess.Popen(
        [sys.executable, WORKER], env=env,
        stdout=subprocess.PIPE, stderr=subprocess.STDOUT,
    )


def _free_port():
    with socket.socket() as s:
        s.bind(("127.0.0.1", 0))
        return s.getsockname()[1]


def test_two_process_crash_resume_and_cross_host_sum(tmp_path):
    # Phase A: host 1 is preempted after one unit.
    procs = [_spawn("crash", p, tmp_path) for p in range(2)]
    outs = [p.communicate(timeout=240)[0] for p in procs]
    assert procs[0].returncode == 0, outs[0].decode()[-2000:]
    assert procs[1].returncode == 17, outs[1].decode()[-2000:]  # preempted
    assert (tmp_path / "run.ckpt.h0").exists()
    assert (tmp_path / "run.ckpt.h1").exists()

    # Phase B: both hosts restart under jax.distributed and resume.
    coord = f"127.0.0.1:{_free_port()}"
    procs = [_spawn("resume", p, tmp_path, coord=coord) for p in range(2)]
    outs = [p.communicate(timeout=300)[0] for p in procs]
    for p, o in zip(procs, outs):
        assert p.returncode == 0, o.decode()[-2000:]

    # Host 1 only had one unfinished unit to re-fuse; host 0 none.
    u0 = np.load(tmp_path / "resumed_units.0.npy")
    u1 = np.load(tmp_path / "resumed_units.1.npy")
    np.testing.assert_array_equal(u0, [0, 2])
    np.testing.assert_array_equal(u1, [1, 3])

    total = np.load(tmp_path / "total.npy")
    grid = VoxelGrid(dims=(17, 17, 17), origin=(-1.6,) * 3, spacing=(0.2,) * 3)
    views = sphere_scene(n_views=8, width=64, height=48)
    exp = integrate_views_oracle(grid, views, PARAMS)
    np.testing.assert_allclose(total, exp, atol=1e-5)
