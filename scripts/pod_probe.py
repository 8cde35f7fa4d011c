"""Pod-scale measurement probe (pre-written for when real pod time exists).

VERDICT round 2 item 9: the standing pod-blocked measurements are
  * views/s at P in {1, 4, 8, 32} and the efficiency curve vs the
    docs/SCALING.md model (per-shard rate retention on z-slabs),
  * DCN broadcast placement: staging (host -> devices) vs fusion time,
  * preemption/resume under a REAL multi-host runtime.
This script is that session, written and locally validated in advance so
pod time is spent measuring, not coding.

Usage on a pod slice (one invocation per host, standard TPU launcher):

    python scripts/pod_probe.py scale stage resume

Local validation on this rig (virtual CPU devices, XLA backend — proves
the measurement code and the bitwise P-invariance gate, not the rates):

    python scripts/pod_probe.py --local 8 scale stage

Design notes
  * The measured quantity is device-resident steady state (stage once,
    fuse many), matching bench.py; per-host disk I/O is reported
    separately because on a pod it overlaps fusion via
    pipeline/streaming.py read-ahead.
  * P-scaling uses SUB-MESHES of the global device list so every P row
    comes from one process launch (no relaunch per P); on a pod, rows
    with P < global device count simply leave the other chips idle.
  * The scaling gate is bitwise: each z-slab is fused independently
    (no cross-slab state, ``CudaReconstruction.cu:211`` is a per-voxel
    sum), so the P-shard volume must equal the P=1 volume exactly.
"""

import sys
import time

sys.path.insert(0, ".")


def _parse_local():
    """Handle --local N before any jax device access (backends are lazy)."""
    argv = sys.argv[1:]
    if "--local" in argv:
        i = argv.index("--local")
        n = int(argv[i + 1])
        del argv[i:i + 2]
        import os

        os.environ["JAX_PLATFORMS"] = "cpu"
        flags = os.environ.get("XLA_FLAGS", "")
        if "xla_force_host_platform_device_count" not in flags:
            os.environ["XLA_FLAGS"] = (
                flags + f" --xla_force_host_platform_device_count={n}"
            ).strip()
        import jax

        jax.config.update("jax_platforms", "cpu")
        return argv, True
    return argv, False


ARGV, LOCAL = _parse_local()

import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402
import numpy as np  # noqa: E402

from cudadepthmapintegration_tpu.core import (  # noqa: E402
    RayPotential,
    VoxelGrid,
)
from cudadepthmapintegration_tpu.parallel import (  # noqa: E402
    ShardedTSDFIntegrator,
    distributed,
    make_mesh,
)
from cudadepthmapintegration_tpu.testing import (  # noqa: E402
    orbit_cameras,
    render_sphere_view,
)

PARAMS = RayPotential(thick=0.025, rho=0.8, eta=0.03, delta=0.1)
# Pod workload: the BASELINE.json north star is 1000 maps -> 1024^3; the
# probe uses 512^3 x 64 views so a single row fits one chip's HBM at P=1
# and the grid still divides over P=32 z-shards (512 cells / 32 = 16).
DIMS, N_VIEWS, W, H = 513, 64, 512, 512
# Local validation shrinks the workload (4 host CPUs): the code paths and
# the bitwise gate are identical, only the rates are meaningless.
if LOCAL:
    DIMS, N_VIEWS, W, H = 65, 16, 128, 96
KERNEL_KW = dict(mode="rowsel3", window_rows=64, rowsel_passes=6,
                 subtile_rows=64)


def banner(s):
    print(f"\n=== {s} ===", flush=True)


def force(x):
    # jax.block_until_ready is unreliable on the axon tunnel (CLAUDE.md);
    # a scalar readback forces completion everywhere.
    return float(jnp.asarray(x).sum())


def build_scene():
    grid = VoxelGrid(dims=(DIMS,) * 3, origin=(-1.6,) * 3,
                     spacing=(3.2 / (DIMS - 1),) * 3)
    cams = orbit_cameras(N_VIEWS, 4.0, focal=0.6 * W, width=W,
                         image_height=H)
    t0 = time.perf_counter()
    # Per-host view loading: each host renders/reads only its stripe, the
    # pod pattern (DCN never carries depth maps to other hosts' chips).
    mine = distributed.host_view_slice(N_VIEWS)
    views = [None] * N_VIEWS
    for i in mine:
        views[i] = render_sphere_view(cams[i], W, H, radius=1.0,
                                      background=-1.0)
    io_s = time.perf_counter() - t0
    if distributed.is_multihost():
        # scale/stage rows need every view on every host's staging path
        # (z-sharded fusion integrates ALL views against the local slab).
        # On a real pod this is the one DCN broadcast of the run.
        from jax.experimental import multihost_utils

        depths = np.zeros((N_VIEWS, H, W), np.float32)
        for i in mine:
            depths[i] = views[i].depth
        depths = np.asarray(
            multihost_utils.process_allgather(jnp.asarray(depths))
        ).sum(axis=0)  # stripes are disjoint; sum == gather
        for i in range(N_VIEWS):
            if views[i] is None:
                views[i] = render_sphere_view(cams[i], W, H, radius=1.0,
                                              background=-1.0)
                views[i].depth[:] = depths[i]
    return grid, views, io_s


def fuse_once(grid, views, mesh, reps=3):
    """Stage + fuse on `mesh`; return (views_per_s, stage_s, volume)."""
    intg = ShardedTSDFIntegrator(grid, PARAMS, mesh)
    use_pallas = jax.devices()[0].platform == "tpu"
    t0 = time.perf_counter()
    if use_pallas:
        staged = intg.stage_pallas_views(views, frustum_cull=True,
                                         **KERNEL_KW)
    stage_s = time.perf_counter() - t0
    best = 1e9
    vol = None
    for _ in range(reps + 1):  # first rep compiles
        intg.reset()
        t0 = time.perf_counter()
        if use_pallas:
            intg.run_staged_pallas(staged)
        else:
            intg.integrate(views)
        force(intg.volume)
        best = min(best, time.perf_counter() - t0)
    vol = intg.result()
    return len(views) / best, stage_s, vol


def phase_scale():
    banner(f"views/s vs P (grid {DIMS - 1}^3, {N_VIEWS} views {W}x{H})")
    devs = jax.devices()
    ps = [p for p in (1, 2, 4, 8, 16, 32) if p <= len(devs)
          and (DIMS - 1) % p == 0]
    ref_vol, ref_rate = None, None
    rows = []
    for p in ps:
        mesh = make_mesh(n_z=p, devices=devs[:p])
        rate, stage_s, vol = fuse_once(GRID, VIEWS, mesh)
        if ref_vol is None:
            ref_vol, ref_rate = vol, rate
            gate = "ref"
        else:
            gate = "BITWISE-OK" if np.array_equal(vol, ref_vol) else \
                "MISMATCH"
        eff = rate / (ref_rate * p)
        rows.append((p, rate, eff, gate))
        print(f"  P={p:2d}: {rate:8.2f} views/s  eff {eff * 100:5.1f}%  "
              f"stage {stage_s * 1e3:6.0f} ms  {gate}", flush=True)
    print("\n  model: docs/SCALING.md predicts eff ~= per-shard kernel-rate"
          " retention (105% equatorial, 78% top-down RING at slab size"
          " 512x512x64); frustum_cull=True recovers the adverse rows"
          " (+21% measured on the busiest slab).", flush=True)
    return rows


def phase_stage():
    banner("staging vs fusion split (DCN/host placement)")
    devs = jax.devices()
    p = min(len(devs), 8)
    if (DIMS - 1) % p:
        p = 1
    mesh = make_mesh(n_z=p, devices=devs[:p])
    rate, stage_s, _ = fuse_once(GRID, VIEWS, mesh)
    fuse_s = len(VIEWS) / rate
    print(f"  P={p}: stage {stage_s:.3f} s (once), fuse {fuse_s:.3f} s per"
          f" {len(VIEWS)}-view pass, view I/O {IO_S:.3f} s on this host",
          flush=True)
    print("  pod placement check: staging must ride host->local-chip PCIe"
          " (per-host stripes), never DCN; a stage_s that scales with"
          " global P instead of local view count indicates misplacement.",
          flush=True)


def phase_resume():
    banner("preemption resume cost model (per-host stripe)")
    # The pod measurement is: SIGKILL one host mid-run, relaunch it, and
    # wall-clock host-rejoin + checkpoint-load + stripe re-fuse (the
    # replica-mode contract, tests/test_multihost_smoke.py pins the
    # logic). Rejoin time is launcher property; the two costs that ARE
    # measurable per-host in advance are checkpoint round-trip and the
    # re-fuse of one stripe — measured here at probe scale so the pod
    # session only needs the rejoin number.
    import os
    import tempfile

    from cudadepthmapintegration_tpu.pipeline.checkpoint import (
        FusionCheckpoint,
        load_checkpoint,
        save_checkpoint,
    )

    devs = jax.devices()
    p = max(jax.process_count(), 1)
    mesh = make_mesh(n_z=len(devs), devices=devs)
    intg = ShardedTSDFIntegrator(GRID, PARAMS, mesh)
    stripe = [VIEWS[i] for i in distributed.host_view_slice(N_VIEWS)]
    t0 = time.perf_counter()
    intg.integrate(stripe)
    force(intg.volume)
    refuse_s = time.perf_counter() - t0
    vol = intg.result()
    with tempfile.TemporaryDirectory() as d:
        path = os.path.join(d, f"probe.ckpt.h{jax.process_index()}")
        t0 = time.perf_counter()
        save_checkpoint(path, FusionCheckpoint(
            volume=vol, views_fused=len(stripe), grid=GRID, params=PARAMS,
        ))
        save_s = time.perf_counter() - t0
        t0 = time.perf_counter()
        load_checkpoint(path)
        load_s = time.perf_counter() - t0
    print(f"  host {jax.process_index()}/{p}: stripe {len(stripe)} views"
          f" re-fuse {refuse_s:.2f} s, ckpt save {save_s:.2f} s /"
          f" load {load_s:.2f} s ({vol.nbytes / 1e6:.0f} MB volume)",
          flush=True)
    print("  pod resume bound ~= rejoin(launcher) + load + re-fuse of the"
          " UNFINISHED units only (typically << the full stripe above).",
          flush=True)


PHASES = {"scale": phase_scale, "stage": phase_stage,
          "resume": phase_resume}


def main():
    global GRID, VIEWS, IO_S
    distributed.initialize()
    print(f"topology: {distributed.topology_summary()}", flush=True)
    want = [a for a in ARGV if a in PHASES] or list(PHASES)
    GRID, VIEWS, IO_S = build_scene()
    for name in want:
        t0 = time.time()
        PHASES[name]()
        print(f"[phase {name}: {time.time() - t0:.0f}s]", flush=True)
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
