"""Benchmark: TSDF fusion throughput + hardware parity gate on the TPU chip.

Per round this measures, on the attached chip:

* voxel-update throughput of the Pallas integrate kernel at three grid
  scales (256^3/512^3 x 32 views, 1024^3 x 16 views), min/median over
  multiple device-resident reps (the rig's host<->device tunnel is ~6 MB/s,
  so end-to-end wall time is transfer-bound and meaningless — see
  docs/KERNEL.md "A note on this dev rig");
* the XLA-lowered integrator on the same chip at the primary config — the
  ``vs_baseline`` denominator (the reference publishes no numbers:
  BASELINE.md);
* the 6-case hardware PARITY GATE (scripts/tpu_validate.py) against the
  fp64 oracle — a Mosaic lowering regression fails the bench loudly
  (non-zero exit) instead of shipping a fast wrong kernel;
* incremental sparse-fusion frame rate (BASELINE config 5 shape).

Prints exactly ONE JSON line:
  {"metric": ..., "value": N, "unit": ..., "vs_baseline": N, ...extras}
"""

import json
import os
import sys
import time

os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/root/.jax_bench_cache")

import jax
import jax.numpy as jnp
import numpy as np

jax.config.update("jax_compilation_cache_dir",
                  os.environ["JAX_COMPILATION_CACHE_DIR"])
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.0)

from cudadepthmapintegration_tpu.core import RayPotential, VoxelGrid
from cudadepthmapintegration_tpu.kernels.integrate_pallas import OrientedFusionPlan
from cudadepthmapintegration_tpu.ops import integrate as I
from cudadepthmapintegration_tpu.testing import orbit_cameras, render_sphere_view

# Kernel configuration benched (the tuned defaults; see docs/KERNEL.md).
# rowsel3: exact bf16 split planes -> DEFAULT-precision select dots;
# 6 passes per column window (the round-2.5 coverage sweep optimum:
# k6 = 4.91 G upd/s @512^3 x 32 vs k2's 4.40, k8 regresses).
KERNEL_PLAN_KW = dict(subtile_rows=64)
KERNEL_RUN_KW = dict(mode="rowsel3", window_rows=64, rowsel_passes=6)
# Per-size pass-count overrides (r2.6c hardware sweep): per-row v-span
# scales with VOXEL size, so the optimum k falls with resolution —
# k10 measured +3% @256^3 (2.47 vs 2.40 G); k4 == k6 @1024^3 (keep 6);
# z_block>1 measured NO win at any size (depth DMA already hidden).
RUN_KW_BY_SIZE = {"256": dict(KERNEL_RUN_KW, rowsel_passes=10)}


def build_workload(dims=513, n_views=32, width=512, height=512):
    grid = VoxelGrid(
        dims=(dims,) * 3, origin=(-1.6,) * 3, spacing=(3.2 / (dims - 1),) * 3
    )
    cams = orbit_cameras(
        n_views, 4.0, focal=300.0, width=width, image_height=height
    )
    views = [
        render_sphere_view(c, width, height, radius=1.0, background=-1.0)
        for c in cams
    ]
    params = RayPotential(thick=0.025, rho=0.8, eta=0.03, delta=0.1)
    return grid, views, params


def bench_pallas(grid, views, params, reps=5, run_kw=None):
    run_kw = KERNEL_RUN_KW if run_kw is None else run_kw
    plan = OrientedFusionPlan(grid, views, params, **KERNEL_PLAN_KW)
    out = plan.run(jnp.zeros(grid.volume_shape, jnp.float32), **run_kw)
    checksum = float(out.sum())  # warms compiles + forces completion
    times = []
    for _ in range(reps):
        t0 = time.perf_counter()
        checksum = float(
            plan.run(
                jnp.zeros(grid.volume_shape, jnp.float32), **run_kw
            ).sum()
        )
        times.append(time.perf_counter() - t0)
    return min(times), float(np.median(times)), checksum


def bench_xla(grid, views, params, reps=1):
    h, w = views[0].depth.shape
    t = I.projection_tables(grid, views, np.float32)
    depths = np.stack([v.depth for v in views]).astype(np.float32)
    args = [jnp.asarray(a) for a in (t.tx, t.ty, t.tz, t.tc, depths)]
    kw = dict(
        h=int(h), w=int(w), view_batch=8,
        thick=params.thick, rho=params.rho, eta=params.eta, delta=params.delta,
    )
    vol = jnp.zeros(grid.volume_shape, jnp.float32)
    vol = I._integrate_batched(vol, *args, **kw)
    checksum = float(vol.sum())
    t0 = time.perf_counter()
    for _ in range(reps):
        vol2 = jnp.zeros(grid.volume_shape, jnp.float32)
        checksum = float(I._integrate_batched(vol2, *args, **kw).sum())
    dt = (time.perf_counter() - t0) / reps
    return dt, checksum


def bench_sharded_slab(views, params, reps=3):
    """Per-shard steady-state rate on a P=8-shaped z-slab (512x512x64
    cells) of the 512^3 grid through the REAL sharded path — shard_map on
    a 1-device mesh, k pinned to z, one donated chain dispatch
    (docs/SCALING.md table). rowsel3's in-chain exact split is gated
    BITWISE against rowsel, pinning the sharded lowering each round."""
    from cudadepthmapintegration_tpu.parallel import (
        ShardedTSDFIntegrator,
        make_mesh,
    )

    slab = VoxelGrid(dims=(513, 513, 65), origin=(-1.6, -1.6, -0.2),
                     spacing=(3.2 / 512,) * 3)
    mesh = make_mesh(n_z=1, n_v=1)
    base_kw = dict(KERNEL_RUN_KW, **KERNEL_PLAN_KW)
    vols = {}
    rate = 0.0
    for m in ("rowsel", "rowsel3"):
        intg = ShardedTSDFIntegrator(slab, params, mesh, dtype=np.float32)
        staged = intg.stage_pallas_views(views, **dict(base_kw, mode=m))
        intg.reset()
        intg.run_staged_pallas(staged)
        float(jnp.sum(intg.volume))  # warm + force
        if m == "rowsel3":
            times = []
            for _ in range(reps):
                intg.reset()
                t0 = time.perf_counter()
                intg.run_staged_pallas(staged)
                float(jnp.sum(intg.volume))
                times.append(time.perf_counter() - t0)
            rate = slab.num_cells * len(views) / min(times)
        vols[m] = intg.volume
    match = bool(jnp.array_equal(vols["rowsel"], vols["rowsel3"]))
    return rate / 1e9, match


def bench_sparse_fps(n_frames=48, width=256, height=192,
                     gather_backend="auto"):
    """Steady-state incremental sparse fusion rate: the first full orbit
    allocates every block and warms every jit bucket size (compiles through
    the remote service would otherwise land in the timed window); the
    SECOND orbit is timed — allocation-stable streaming, the config-5
    operating regime. Per-frame depth upload rides this rig's ~6 MB/s
    tunnel and is counted (it would be ~free on a real TPU VM; the loop is
    host-dispatch-bound here, so the backends measure within ~6%)."""
    from cudadepthmapintegration_tpu.ops.sparse_grid import SparseTSDFGrid

    params = RayPotential(thick=0.04, rho=0.8, eta=0.03, delta=0.16)
    cams = orbit_cameras(n_frames, 4.0, focal=150.0,
                         width=width, image_height=height)
    views = [render_sphere_view(c, width, height) for c in cams]
    sparse = SparseTSDFGrid(voxel_size=0.02, params=params, pixel_stride=4,
                            gather_backend=gather_backend)
    for v in views:  # warm pass: allocate + compile all bucket sizes
        sparse.integrate_frame(v)
    float(sparse.pool.sum())
    t0 = time.perf_counter()
    for v in views:
        sparse.integrate_frame(v)
    float(sparse.pool.sum())  # force completion
    dt = time.perf_counter() - t0
    # Canonical content: block values ordered by block COORDINATE, not by
    # pool slot — the pallas path Morton-orders allocation, so slot order
    # (and hence pool.sum()'s fp32 reduction order) differs across
    # backends while per-voxel content is identical.
    coords = sorted(sparse.block_map)
    slots = np.array([sparse.block_map[c] for c in coords], np.int32)
    content = np.asarray(sparse.pool[jnp.asarray(slots)])
    return n_frames / dt, content


def bench_coloration(n_target=1 << 18, nv=64, w=512, h=512, reps=3):
    """Device-resident samples/s of the coloration gather stage, pallas vs
    xla, on an MC-sphere vertex set (production welded order) — tracks the
    second Mosaic kernel round-over-round, at the SAME workload as the
    numbers in docs/KERNEL.md (242k verts x 64 views of 512^2; smaller
    workloads under-amortize per-dispatch latency on this rig and read
    ~3x low). Steady state: points/planes staged once, on-device checksum
    forces completion (tunnel rig rules, docs/KERNEL.md)."""
    from cudadepthmapintegration_tpu.kernels.coloration_pallas import (
        _gather_colors_padded,
        _morton_order,
        stage_color_planes,
        stage_point_tiles,
    )
    from cudadepthmapintegration_tpu.ops.coloration import _gather_chunk
    from cudadepthmapintegration_tpu.ops.marching_cubes import marching_cubes

    rng = np.random.default_rng(7)
    dim = int(np.sqrt(n_target / 3.5))
    ax = np.linspace(-1.2, 1.2, dim, dtype=np.float32)
    zz, yy, xx = np.meshgrid(ax, ax, ax, indexing="ij")
    vol = 1.0 - np.sqrt(xx * xx + yy * yy + zz * zz)
    pts = marching_cubes(vol, 0.0, ax, ax, ax,
                         compute_normals=False).points.astype(np.float32)
    views = orbit_cameras(nv, 4.0, focal=300.0, width=w, image_height=h)
    colors = rng.integers(0, 256, (nv, h, w, 3), dtype=np.uint8)
    proj = np.stack([(c.k4 @ c.rt)[:3, :] for c in views])

    # pallas steady state (tuned defaults: sj32 wr64 k2 wc2 tb8).
    sj, tb, n_wc, n_k, wr = 32, 8, 2, 2, 64
    staged = stage_color_planes(colors)
    proj12 = jnp.asarray(proj.reshape(nv, 12).astype(np.float32))
    # Operand packing comes from the kernel module itself (single source
    # of the tile layout), so a kernel layout change cannot leave this
    # bench timing a kernel that gathers garbage.
    pts_t, _nt = stage_point_tiles(pts[_morton_order(pts)], sj=sj,
                                   tile_block=tb)
    kw = dict(h=h, w=w, sj=sj, tb=tb,
              wr=min(wr, staged.planes.shape[2]), n_wc=n_wc, n_k=n_k,
              z_test=False)

    def run_pallas():
        return float(_gather_colors_padded(pts_t, proj12, staged.planes,
                                           **kw).sum())

    def best_of(fn):
        fn()  # warm compile
        best = 1e9
        for _ in range(reps):
            t0 = time.perf_counter()
            fn()
            best = min(best, time.perf_counter() - t0)
        return best

    dt_p = best_of(run_pallas)

    colors_flat = jnp.asarray(colors.reshape(nv, h * w, 3))
    proj_j = jnp.asarray(proj.astype(np.float32))
    pts_j = jnp.asarray(pts)

    def run_xla():
        r, _ = _gather_chunk(pts_j, proj_j, colors_flat, h=h, w=w,
                             z_test=False)
        return float(jnp.sum(r.astype(jnp.float32)))

    dt_x = best_of(run_xla)
    n_samples = len(pts) * nv
    return n_samples / dt_p / 1e9, n_samples / dt_x / 1e9


def coloration_parity():
    """Per-round hardware gate for the SECOND Mosaic kernel (coloration):
    pallas and xla backends must agree bit-for-bit on mean/median/count
    (kernels/coloration_pallas.py vs the XLA gather path)."""
    from cudadepthmapintegration_tpu.ops.coloration import colorize_points
    from cudadepthmapintegration_tpu.testing import sphere_scene

    rng = np.random.default_rng(3)
    views = sphere_scene(n_views=8, width=256, height=192, focal=150.0)
    for v in views:
        v.color[:] = rng.integers(0, 256, v.color.shape, dtype=np.uint8)
    pts = ((rng.random((4000, 3)) - 0.5) * 2.4).astype(np.float64)
    a = colorize_points(pts, views, backend="pallas")
    b = colorize_points(pts, views, backend="xla", dtype=np.float32)
    return all(np.array_equal(x, y) for x, y in zip(a, b))


def _tunnel_alive(port=8082, timeout=5.0) -> bool:
    """The axon relay listens on 8082+; if it is dead every device touch
    hangs forever (CLAUDE.md 'TUNNEL DEATH'). Probe before benching."""
    import socket

    try:
        socket.create_connection(("127.0.0.1", port), timeout=timeout).close()
        return True
    except OSError:
        return False


def main():
    if not _tunnel_alive():
        print(
            json.dumps(
                {
                    "metric": "tsdf_voxel_updates_per_sec_512cube_32views",
                    "value": 0,
                    "unit": "voxel_updates/s",
                    "vs_baseline": 0,
                    "error": "TPU tunnel relay down (no listener on 8082); "
                    "see CLAUDE.md 'TUNNEL DEATH'",
                }
            )
        )
        return 2
    sys.path.insert(0, os.path.join(os.path.dirname(__file__), "scripts"))
    import tpu_validate

    # --- throughput at three scales ------------------------------------
    sizes = {}
    # 256^3 and 512^3 x 32 views of 512^2; 1024^3 x 16 views.
    for label, dims, n_views, reps in (
        ("256", 257, 32, 5),
        ("512", 513, 32, 5),
        ("1024", 1025, 16, 3),
    ):
        grid, views, params = build_workload(dims=dims, n_views=n_views)
        tmin, tmed, _ = bench_pallas(
            grid, views, params, reps=reps,
            run_kw=RUN_KW_BY_SIZE.get(label),
        )
        upd = grid.num_cells * n_views
        sizes[label] = {
            "gups_min": round(upd / tmin / 1e9, 3),
            "gups_median": round(upd / tmed / 1e9, 3),
        }
        if label == "512":
            grid512, views512, params512 = grid, views, params
            t512 = tmin

    # --- XLA baseline at the primary config ----------------------------
    t_xla, sum_x = bench_xla(grid512, views512, params512)
    plan_sum = bench_pallas(grid512, views512, params512, reps=1)[2]
    rel = abs(plan_sum - sum_x) / max(abs(sum_x), 1.0)
    if rel > 1e-3:
        print(
            f"WARNING: pallas/xla checksums diverge: {plan_sum} vs {sum_x}",
            file=sys.stderr,
        )

    # --- hardware parity gate ------------------------------------------
    parity_ok, parity_flips = tpu_validate.run_parity(
        verbose=False, **KERNEL_PLAN_KW, **KERNEL_RUN_KW
    )
    if not parity_ok:
        print("PARITY GATE FAILED — details:", file=sys.stderr)
        tpu_validate.run_parity(verbose=True, **KERNEL_PLAN_KW, **KERNEL_RUN_KW)

    # --- per-shard sharded rate + in-chain split gate -------------------
    sharded_gups, sharded_match = bench_sharded_slab(views512, params512)
    if not sharded_match:
        print("SHARDED SPLIT GATE FAILED (rowsel3 != rowsel in shard_map)",
              file=sys.stderr)

    # --- sparse incremental fps (both gather backends) -----------------
    sparse_fps_pallas, content_sp = bench_sparse_fps(gather_backend="pallas")
    sparse_fps_xla, content_sx = bench_sparse_fps(gather_backend="xla")
    sparse_fps = max(sparse_fps_pallas, sparse_fps_xla)
    # Cross-backend gate on canonical CONTENT (same block-coordinate
    # order for both backends): bitwise match expected — the sparse paths
    # cut their fusions with optimization_barrier so both programs compile
    # the same projection/accumulate subgraphs. rel <= 1e-5 is the hard
    # gate (a toolchain that re-contracts across the barrier would
    # reintroduce benign ulp-level pixel flips — fail only on real
    # divergence).
    sparse_match = (
        content_sp.shape == content_sx.shape
        and bool(np.array_equal(content_sp, content_sx))
    )
    denom = max(float(np.abs(content_sx).max()), 1e-30)
    sparse_rel = (
        float(np.abs(content_sp - content_sx).max()) / denom
        if content_sp.shape == content_sx.shape
        else float("inf")
    )
    sparse_rel_ok = sparse_rel <= 1e-5
    if not sparse_match:
        print(
            f"WARNING: sparse gather backends diverge "
            f"(max rel {sparse_rel:.2e} over {content_sx.size} voxels)",
            file=sys.stderr,
        )

    # --- HD depth maps on the HBM band-sweep path (round-3 capability:
    # 1920x1080 was a hard error before; now parity-gated vs XLA) -------
    grid_hd, views_hd, params_hd = build_workload(
        dims=257, n_views=8, width=1920, height=1080
    )
    t_hd, _, sum_hd = bench_pallas(
        grid_hd, views_hd, params_hd, reps=3,
        run_kw=dict(mode="rowsel3h", window_rows=64, rowsel_passes=6),
    )
    t_hd_xla, sum_hd_xla = bench_xla(grid_hd, views_hd, params_hd)
    hd_rel = abs(sum_hd - sum_hd_xla) / max(abs(sum_hd_xla), 1.0)
    hd_ok = hd_rel < 1e-3
    if not hd_ok:
        print(
            f"HD BAND-SWEEP GATE FAILED: {sum_hd} vs xla {sum_hd_xla}",
            file=sys.stderr,
        )
    hd_gups = grid_hd.num_cells * 8 / t_hd / 1e9

    # --- coloration kernel parity gate + throughput ----------------------
    color_ok = coloration_parity()
    if not color_ok:
        print("COLORATION PARITY GATE FAILED", file=sys.stderr)
    color_gsps_p, color_gsps_x = bench_coloration()

    n_updates = grid512.num_cells * len(views512)
    value = n_updates / t512
    print(
        json.dumps(
            {
                "metric": "tsdf_voxel_updates_per_sec_512cube_32views",
                "value": round(value / 1e9, 4) * 1e9,
                "unit": "voxel_updates/s",
                "vs_baseline": round(t_xla / t512, 3),
                "configs_gups": sizes,
                "parity_flips": parity_flips,
                "parity_ok": parity_ok,
                "coloration_parity_ok": color_ok,
                "coloration_gsps": {
                    "pallas": round(color_gsps_p, 3),
                    "xla": round(color_gsps_x, 3),
                },
                "sharded_slab_gups": round(sharded_gups, 3),
                "sharded_split_match": sharded_match,
                "hbm_hd_1080p": {
                    "gups": round(hd_gups, 3),
                    "vs_xla": round(t_hd_xla / t_hd, 2),
                    "parity_ok": hd_ok,
                },
                "sparse_backends_match": sparse_match,
                "sparse_backend_rel": float(f"{sparse_rel:.3e}"),
                "sparse_fusion_fps": round(sparse_fps, 1),
                "sparse_fps_by_backend": {
                    "pallas": round(sparse_fps_pallas, 1),
                    "xla": round(sparse_fps_xla, 1),
                },
                "kernel": {
                    **KERNEL_PLAN_KW,
                    **KERNEL_RUN_KW,
                    "per_size": {
                        k: v["rowsel_passes"]
                        for k, v in RUN_KW_BY_SIZE.items()
                    },
                },
            }
        )
    )
    return 0 if (parity_ok and color_ok and sparse_rel_ok
                 and sharded_match and hd_ok) else 1


if __name__ == "__main__":
    raise SystemExit(main())
