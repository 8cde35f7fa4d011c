"""TPU probe: per-shard (z-slab) Pallas fusion throughput on ONE chip.

The sharded design's ≥80% scaling claim reduces to: a z-slab shard
sustains (close to) the full-grid per-chip update rate, for good AND
adversarial rigs. A pod isn't needed to measure the per-shard kernel —
run the REAL sharded code path (ShardedTSDFIntegrator.integrate_pallas,
shard_map, k pinned to z, free-axes orientation grouping) on a 1-device
mesh with a slab-shaped grid (512x512x64 cells = one P=8 shard of the
bench 512^3), and compare against:

  * the full-grid single-chip plan (the bench baseline, free k choice);
  * the plain plan on the same slab (free k choice — isolates the cost
    of the sharding's pinned k=z from slab-size amortization effects);

for two rigs: the bench equatorial orbit (cameras look ACROSS z — the
favorable case for k=z) and an adversarial top-down ring (cameras look
ALONG z: neither free axis tracks the viewing direction; docs/SCALING.md
calls this the worst case and says to shard the axis cameras look along
least).

One process (tunnel discipline, CLAUDE.md).
"""

import sys
import time

sys.path.insert(0, ".")

import jax.numpy as jnp
import numpy as np

from cudadepthmapintegration_tpu.core import RayPotential, VoxelGrid
from cudadepthmapintegration_tpu.kernels.integrate_pallas import (
    OrientedFusionPlan,
)
from cudadepthmapintegration_tpu.parallel import (
    ShardedTSDFIntegrator,
    make_mesh,
)
from cudadepthmapintegration_tpu.testing import (
    look_at_camera,
    orbit_cameras,
    render_sphere_view,
)

N_VIEWS = 32
W = H = 512
PARAMS = RayPotential(thick=0.025, rho=0.8, eta=0.03, delta=0.1)
KW = dict(mode="rowsel", window_rows=64, rowsel_passes=6, subtile_rows=64)


def rigs():
    eq = orbit_cameras(N_VIEWS, 4.0, focal=300.0, width=W, image_height=H)
    # Top-down ring: small radius, high above -> view dir ~ -z, but u
    # sweeps every in-plane direction over the ring.
    td = orbit_cameras(N_VIEWS, 0.8, height=4.0, focal=300.0,
                       width=W, image_height=H)
    # Straight-down SCAN: translated cameras with IDENTICAL orientation
    # (a mapping rig) — the case grid_for_sharding fully recovers, since
    # one global k suits every view.
    side = int(np.ceil(np.sqrt(N_VIEWS)))
    scan = [
        look_at_camera(
            (-0.5 + (i % side) / max(side - 1, 1),
             -0.5 + (i // side) / max(side - 1, 1),
             4.0),
            (-0.5 + (i % side) / max(side - 1, 1),
             -0.5 + (i // side) / max(side - 1, 1),
             0.0),
            focal=300.0, width=W, height=H,
        )
        for i in range(N_VIEWS)
    ]
    # Narrow-FOV side scan along z: each camera's frustum covers only a
    # few z slabs — the frustum-culling case (the orbit rigs see the whole
    # grid from every view, so nothing can ever cull there).
    zscan = [
        look_at_camera(
            (-4.5, 0.0, -1.2 + 2.4 * i / (N_VIEWS - 1)),
            (0.0, 0.0, -1.2 + 2.4 * i / (N_VIEWS - 1)),
            focal=2500.0, width=W, height=H,
        )
        for i in range(N_VIEWS)
    ]
    return {"equatorial": eq, "top-down": td, "down-scan": scan,
            "side-scan": zscan}


def full_grid():
    return VoxelGrid(dims=(513,) * 3, origin=(-1.6,) * 3,
                     spacing=(3.2 / 512,) * 3)


def slab_grid():
    # The middle P=8 slab of the 512^3 grid (cz = 64 cells).
    return VoxelGrid(dims=(513, 513, 65), origin=(-1.6, -1.6, -0.2),
                     spacing=(3.2 / 512,) * 3)


def time_plan(grid, views):
    plan = OrientedFusionPlan(grid, views, PARAMS,
                              subtile_rows=KW["subtile_rows"])
    kw = {k: v for k, v in KW.items() if k != "subtile_rows"}
    checksum = float(
        plan.run(jnp.zeros(grid.volume_shape, jnp.float32), **kw).sum()
    )
    best = 1e9
    for _ in range(3):
        t0 = time.perf_counter()
        checksum = float(
            plan.run(jnp.zeros(grid.volume_shape, jnp.float32), **kw).sum()
        )
        best = min(best, time.perf_counter() - t0)
    return grid.num_cells * len(views) / best, checksum


def time_sharded(grid, views, kw=KW):
    # Steady state: stage once (tables/depths device-resident — on a real
    # VM the per-batch upload is sub-ms; on this rig's 6 MB/s tunnel it
    # would read as a 27x slowdown and measure the tunnel, not the kernel).
    # reset() fills zeros ON DEVICE (sharded), so keeping it inside the
    # timed loop costs a fill, not a host upload; the step donates the
    # volume so each rep needs the fresh buffer anyway.
    mesh = make_mesh(n_z=1, n_v=1)
    intg = ShardedTSDFIntegrator(grid, PARAMS, mesh, dtype=np.float32)
    staged = intg.stage_pallas_views(views, **kw)

    def run():
        intg.reset()
        intg.run_staged_pallas(staged)
        return float(jnp.sum(intg.volume))

    checksum = run()
    best = 1e9
    for _ in range(3):
        t0 = time.perf_counter()
        checksum = run()
        best = min(best, time.perf_counter() - t0)
    return grid.num_cells * len(views) / best, checksum


def auto_slab(views):
    """P=8-shaped z'-slab of the FULL grid relabeled by grid_for_sharding:
    the mitigation path for rigs looking along z (docs/SCALING.md)."""
    from cudadepthmapintegration_tpu.parallel import grid_for_sharding

    pg, perm = grid_for_sharding(full_grid(), views)
    if perm == (0, 1, 2):
        return None  # rig already z-friendly; nothing to measure
    # Middle 64-cell z'-slab of the permuted cube (513^3 stays a cube).
    o = list(pg.origin)
    o[2] = -0.2
    return VoxelGrid(dims=(513, 513, 65), origin=tuple(o),
                     spacing=pg.spacing, matrix=pg.matrix)


def main():
    only = set(sys.argv[1:])  # optional rig-name filter
    full = full_grid()
    slab = slab_grid()
    for rig_name, cams in rigs().items():
        if only and rig_name not in only:
            continue
        views = [render_sphere_view(c, W, H, radius=1.0, background=-1.0)
                 for c in cams]
        print(f"== rig: {rig_name} (rowsel k6, {N_VIEWS} views) ==",
              flush=True)
        kw3 = dict(KW, mode="rowsel3")
        rows = [
            ("full 512^3, plain plan   ", time_plan, full),
            ("slab 512x512x64, plain   ", time_plan, slab),
            ("slab 512x512x64, SHARDED ", time_sharded, slab),
            ("slab SHARDED rowsel3     ",
             lambda g, v: time_sharded(g, v, kw3), slab),
        ]
        aslab = auto_slab(views)
        if aslab is not None:
            rows.append(("slab AUTO-axis, SHARDED  ", time_sharded, aslab))
        if rig_name == "side-scan":
            # Frustum-culled staging: per-shard view lists (here 1 shard =
            # the slab). Rate is computed against the UNCULLED workload
            # (cells x all views), so the win reads directly; checksums
            # must match the unculled row bitwise.
            from cudadepthmapintegration_tpu.parallel import slab_view_mask

            kept = int(slab_view_mask(slab, views, 1).sum())
            print(f"  [frustum: {kept}/{len(views)} views touch the slab]",
                  flush=True)
            rows.append((
                "slab SHARDED CULLED      ",
                lambda g, v: time_sharded(g, v, dict(KW, frustum_cull=True)),
                slab,
            ))
        for label, fn, grid in rows:
            try:
                ups, checksum = fn(grid, views)
                print(f"  {label}: {ups / 1e9:6.2f} G upd/s "
                      f"(checksum {checksum:.6g})", flush=True)
            except Exception as e:
                print(f"  {label}: FAILED [{type(e).__name__}] "
                      f"{str(e)[:140]}", flush=True)
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
