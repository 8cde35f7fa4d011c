"""Capstone run (BASELINE.json north star, single-chip slice): fuse 1000
depth maps into a 1024^3 grid on one TPU chip.

Depth maps are rendered ON DEVICE (analytic sphere, same math as
testing/synthetic.py) and all projection tables are staged in ONE bulk
upload, because this dev rig reaches the TPU through a tunnel with seconds
of per-transfer latency. On a production TPU VM, host staging streams at
GB/s and overlaps fusion (pipeline/streaming.py); the fusion math is
identical to the library path (pallas_integrate).

Run:  python scripts/capstone_1024.py [n_views] [dims]
      python scripts/capstone_1024.py hd [n_views] [dims]   # 1080p views
      python scripts/capstone_1024.py ckpt                  # resume drill

Tried and REVERTED (2026-08-20): compiling each group's whole batch loop
into one jitted fori_loop dispatch (to remove the ~1.7 s/batch eager
dispatch RTT this rig's tunnel inflicts — measured k6 270 s vs the
~180 s the kernel rate implies) CRASHES the TPU worker at 1024^3, with
and without donating the volume into the loop ("TPU worker process
crashed or restarted", twice, 2 runs). The eager per-batch loop stands;
on a production TPU VM the per-dispatch RTT is negligible, so the rig
tax is a tunnel artifact, not a framework property.

Round 5 (VERDICT r4 item 1): CAPSTONE_CHUNK=c jits c consecutive
render+integrate batches into ONE donated dispatch (an unrolled chain
over a traced chunk index into pre-stacked per-group camera/table
arrays), sitting between the safe eager loop (c=1, the default) and the
worker-crashing whole-group loop (c=n_batches). Tail batches that don't
fill a chunk run the eager path. Used to bisect the per-dispatch
device-time budget the worker tolerates; results in docs/SCALING.md.

Round-4 additions (VERDICT r3 item 5): per-orientation-group adaptive
pass counts (CAPSTONE_K=auto, the production default — same sampled-span
machinery as OrientedFusionPlan); an HD phase (1920x1080 maps through the
HBM band modes, CAPSTONE_HD_MODE selects rowsel3h/rowselw); and a
mid-run checkpoint/resume drill (save at the halfway view, reload, finish,
compare checksums against the straight run — at 257^3 where the volume
D2H fits this rig's ~6 MB/s tunnel; the checkpoint math is grid-size
independent, pipeline/checkpoint.py).
"""

import functools
import os
import sys
import time

sys.path.insert(0, ".")

import os as _os
_os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/root/.jax_bench_cache")

import jax
import jax.numpy as jnp
import numpy as np

from cudadepthmapintegration_tpu.core import RayPotential, VoxelGrid
from cudadepthmapintegration_tpu.core.view import DepthMapView
from cudadepthmapintegration_tpu.kernels.integrate_pallas import (
    _pad_table_invalid,
    _sample_group_spans,
    group_views_by_orientation,
    pallas_integrate,
    recommend_rowsel_passes,
)
from cudadepthmapintegration_tpu.ops.integrate import projection_tables
from cudadepthmapintegration_tpu.ops.marching_cubes import extract_isosurface
from cudadepthmapintegration_tpu.testing import look_at_camera


@functools.partial(jax.jit, static_argnums=(2, 3))
def render_sphere_batch(k_invs, c_cams, width, height, radius=1.0):
    """Device-side sphere depth render for a batch of cameras."""

    def one(k_inv, c_cam):
        us = jnp.arange(width, dtype=jnp.float32)[None, :]
        vs = jnp.arange(height, dtype=jnp.float32)[:, None]
        dx = k_inv[0, 0] * us + k_inv[0, 1] * vs + k_inv[0, 2]
        dy = k_inv[1, 0] * us + k_inv[1, 1] * vs + k_inv[1, 2]
        dz = jnp.ones_like(dx) * k_inv[2, 2]
        dd = dx * dx + dy * dy + dz * dz
        dc = dx * c_cam[0] + dy * c_cam[1] + dz * c_cam[2]
        disc = dc * dc - dd * (c_cam @ c_cam - radius * radius)
        hit = disc >= 0
        t = (dc - jnp.sqrt(jnp.where(hit, disc, 0.0))) / dd
        hit &= t > 0
        return jnp.where(hit, t * dz, -1.0)

    return jax.vmap(one)(k_invs, c_cams)


def fuse(n_views, dims, w=512, h=512, mode="rowsel3", checkpoint_mid=None,
         mesh=True):
    """Fuse n_views device-rendered sphere maps into a dims^3 grid.

    mode: any pallas_integrate mode (HD phases use the HBM band modes).
    checkpoint_mid: path — save a pipeline checkpoint after roughly half
    the views, DISCARD the live volume, reload from disk, and finish —
    the BASELINE preemption-resume property driven at capstone scale.
    Returns (checksum, G upd/s)."""
    batch = 16

    grid = VoxelGrid(
        dims=(dims,) * 3, origin=(-1.63, -1.61, -1.59),
        spacing=(3.2 / (dims - 1),) * 3,
    )
    params = RayPotential(
        thick=2.0 * grid.spacing[0], rho=0.8, eta=0.03,
        delta=8.0 * grid.spacing[0],
    )
    rng = np.random.default_rng(0)
    f_scale = w / 512.0  # keep the grid's image footprint fraction at HD
    cams = []
    for i in range(n_views):
        a = 2 * np.pi * i / n_views
        r = float(rng.uniform(3.5, 4.5))
        eye = (r * np.cos(a), r * np.sin(a), float(rng.uniform(-1, 1)))
        cams.append(
            look_at_camera(eye, (0, 0, 0),
                           focal=f_scale * float(rng.uniform(250, 350)),
                           width=w, height=h)
        )

    # ---- One-time host prep + bulk staging -------------------------------
    print("staging tables + camera constants...", flush=True)
    t_stage = time.time()
    views = [
        DepthMapView(depth=np.zeros((1, 1), np.float32), camera=c) for c in cams
    ]
    tables = projection_tables(grid, views, np.float32)
    axis_tables = {0: tables.tx, 1: tables.ty, 2: tables.tz}
    rots = [(c.rt @ grid.matrix)[:3, :3] for c in cams]
    groups = group_views_by_orientation(rots)
    k_invs_all = jnp.asarray(
        np.stack([np.linalg.inv(c.k) for c in cams]), jnp.float32
    )
    c_cams_all = jnp.asarray(
        np.stack([c.rt[:3, 3] for c in cams]), jnp.float32
    )

    cz, cy, cx = grid.volume_shape
    staged = []  # (order, inv, pads, device tables, view ids)
    for perm, idxs in sorted(groups.items()):
        k_ax, s_ax, l_ax = perm
        order = (2 - k_ax, 2 - s_ax, 2 - l_ax)
        inv = tuple(int(x) for x in np.argsort(order))
        dims_p = [(cz, cy, cx)[o] for o in order]
        czp, cyp, cxp = dims_p
        py, px = (-cyp) % 64, (-cxp) % 128  # sj=64 subtiles, 128 lanes
        sel = np.asarray(idxs)
        pad_views = (-len(sel)) % batch
        # np.resize repeats cyclically — correct even when the group is
        # smaller than one batch (the tail mask zeroes the repeats).
        sel_p = np.resize(sel, len(sel) + pad_views) if pad_views else sel
        # Per-group pass count (CAPSTONE_K=auto default): the same
        # sampled-span machinery OrientedFusionPlan ships in production
        # ('rowsel_passes="auto"', docs/KERNEL.md round-3 table).
        k_env = os.environ.get("CAPSTONE_K", "auto")
        if k_env == "auto":
            stats = _sample_group_spans(
                axis_tables[l_ax][sel], axis_tables[s_ax][sel],
                axis_tables[k_ax][sel], tables.tc[sel],
                czp, cyp, cxp, h, w, 64, 64, 2,
            )
            n_k = recommend_rowsel_passes(stats, 64)
        else:
            n_k = int(k_env)
        staged.append(
            dict(
                order=order, inv=inv, py=py, px=px, cyp=cyp, cxp=cxp,
                n_real=len(sel),
                sel=sel_p, n_k=n_k,
                tx=jnp.asarray(_pad_table_invalid(axis_tables[l_ax][sel_p], cxp + px)),
                ty=jnp.asarray(_pad_table_invalid(axis_tables[s_ax][sel_p], cyp + py)),
                tz=jnp.asarray(axis_tables[k_ax][sel_p]),
                tc=jnp.asarray(tables.tc[sel_p]),
            )
        )
    print(f"staged in {time.time() - t_stage:.1f}s "
          f"(groups: {[g['n_real'] for g in staged]}, "
          f"passes: {[g['n_k'] for g in staged]})", flush=True)

    # ---- Fusion ----------------------------------------------------------
    vol = jnp.zeros(grid.volume_shape, jnp.float32)
    print(
        f"fusing {n_views} x {w}x{h} depth maps into "
        f"{grid.cell_dims} cells ({grid.num_cells/1e9:.2f} G voxels)",
        flush=True,
    )
    t0 = time.time()
    n_done = 0
    ckpt_done = checkpoint_mid is None
    # CAPSTONE_CHUNK=c: jit c render+integrate batches per dispatch (the
    # middle ground between the eager loop and the worker-crashing
    # whole-group loop). Tail batches and checkpoint-drill runs go eager.
    chunk_n = int(os.environ.get("CAPSTONE_CHUNK", "1"))
    if checkpoint_mid is not None:
        chunk_n = 1
    for g in staged:
        volp = jnp.transpose(vol, g["order"])
        if g["py"] or g["px"]:
            volp = jnp.pad(volp, ((0, 0), (0, g["py"]), (0, g["px"])))
        sel_dev = jnp.asarray(g["sel"], jnp.int32)
        n_pad = len(g["sel"])
        s_start = 0
        n_steps = n_pad // batch
        n_chunks = n_steps // chunk_n if chunk_n > 1 else 0
        if n_chunks:
            # Pre-stack per-step cameras/tables/masks; one jitted chain
            # per group (traced chunk index -> one compile, n_chunks
            # dispatches of chunk_n batches each).
            kinvs_g = jnp.take(k_invs_all, sel_dev, axis=0).reshape(
                n_steps, batch, 3, 3)
            ccams_g = jnp.take(c_cams_all, sel_dev, axis=0).reshape(
                n_steps, batch, 3)
            masks = np.zeros((n_steps, batch, 1, 1), bool)
            for si in range(n_steps):
                nr = max(0, min(batch, g["n_real"] - si * batch))
                masks[si, :nr] = True
            masks_g = jnp.asarray(masks)
            shape4 = lambda a: a.reshape(n_steps, batch, 4, a.shape[-1])
            txs, tys, tzs, tcs = (shape4(g["tx"]), shape4(g["ty"]),
                                  shape4(g["tz"]),
                                  g["tc"].reshape(n_steps, batch, 4))
            n_k_g = g["n_k"]
            kz_g = int(os.environ.get("CAPSTONE_KZ", "1"))
            idx = functools.partial(
                jax.lax.dynamic_index_in_dim, axis=0, keepdims=False)

            @functools.partial(jax.jit, donate_argnums=(0,))
            def run_chunk(volp, ci, txs=txs, tys=tys, tzs=tzs, tcs=tcs,
                          kinvs=kinvs_g, ccams=ccams_g, msk=masks_g,
                          n_k_g=n_k_g, kz_g=kz_g):
                for j in range(chunk_n):
                    si = ci * chunk_n + j
                    depths = render_sphere_batch(
                        idx(kinvs, si), idx(ccams, si), w, h)
                    depths = jnp.where(idx(msk, si), depths, -1.0)
                    volp = pallas_integrate(
                        volp, idx(txs, si), idx(tys, si), idx(tzs, si),
                        idx(tcs, si), depths,
                        params.thick, params.rho, params.eta, params.delta,
                        subtile_rows=64, mode=mode, window_rows=64,
                        rowsel_passes=n_k_g, z_block=kz_g,
                    )
                return volp

            t_ch = time.time()
            for ci in range(n_chunks):
                volp = run_chunk(volp, ci)
                n_done += int(
                    masks[ci * chunk_n:(ci + 1) * chunk_n, :, 0, 0].sum())
            s_start = n_chunks * chunk_n * batch
            volp.block_until_ready()
            print(f"  chunked phase: {n_chunks} x {chunk_n}-batch "
                  f"dispatches in {time.time() - t_ch:.1f}s", flush=True)
        for s in range(s_start, n_pad, batch):
            if not ckpt_done and n_done >= n_views // 2:
                # Mid-run preemption drill: save the canonical volume,
                # drop the live one, reload from disk, keep fusing. Every
                # step (transpose round trip, D2H, npz, H2D) is value-
                # preserving, so the final checksum must equal the
                # straight run's bit for bit.
                from cudadepthmapintegration_tpu.pipeline.checkpoint import (
                    FusionCheckpoint,
                    load_checkpoint,
                    save_checkpoint,
                )

                t_c = time.time()
                vol_c = np.asarray(
                    jnp.transpose(volp[:, : g["cyp"], : g["cxp"]], g["inv"])
                )
                save_checkpoint(checkpoint_mid, FusionCheckpoint(
                    volume=vol_c, views_fused=n_done, grid=grid,
                    params=params))
                del volp, vol_c
                ck = load_checkpoint(checkpoint_mid)
                assert ck.matches(grid, params), "checkpoint config drifted"
                assert ck.views_fused == n_done
                volp = jnp.transpose(jnp.asarray(ck.volume), g["order"])
                if g["py"] or g["px"]:
                    volp = jnp.pad(
                        volp, ((0, 0), (0, g["py"]), (0, g["px"])))
                ckpt_done = True
                print(f"  checkpoint/resume drill at {n_done} views "
                      f"({time.time() - t_c:.1f}s incl. D2H+H2D on the "
                      f"~6 MB/s tunnel)", flush=True)
            ids = sel_dev[s : s + batch]
            depths = render_sphere_batch(
                jnp.take(k_invs_all, ids, axis=0),
                jnp.take(c_cams_all, ids, axis=0),
                w, h,
            )
            # Duplicated pad views at the tail would double-count: zero them
            # by feeding all-invalid depth maps instead.
            n_real_here = max(0, min(batch, g["n_real"] - s))
            if n_real_here < batch:
                mask = (
                    jnp.arange(batch) < n_real_here
                )[:, None, None]
                depths = jnp.where(mask, depths, -1.0)
            volp = pallas_integrate(
                volp,
                jax.lax.dynamic_slice_in_dim(g["tx"], s, batch, 0),
                jax.lax.dynamic_slice_in_dim(g["ty"], s, batch, 0),
                jax.lax.dynamic_slice_in_dim(g["tz"], s, batch, 0),
                jax.lax.dynamic_slice_in_dim(g["tc"], s, batch, 0),
                depths,
                params.thick, params.rho, params.eta, params.delta,
                # Tuned round-2.5 defaults + per-group auto passes
                # (docs/KERNEL.md); the rendered depths stay on device —
                # rowsel3's plane split runs on-chip too
                # (split_depth_planes jax path).
                subtile_rows=64, mode=mode, window_rows=64,
                rowsel_passes=g["n_k"],
                z_block=int(os.environ.get("CAPSTONE_KZ", "1")),
            )
            n_done += n_real_here
        vol = jnp.transpose(volp[:, : g["cyp"], : g["cxp"]], g["inv"])
        vol.block_until_ready()
        rate = grid.num_cells * n_done / (time.time() - t0)
        print(f"  {n_done}/{n_views} views, {rate/1e9:.2f} G upd/s", flush=True)

    checksum = float(vol.sum())
    dt = time.time() - t0
    updates = grid.num_cells * n_views
    rate = updates / dt / 1e9
    print(
        f"DONE: {n_views} x {w}x{h} views -> {dims-1}^3 mode={mode} in "
        f"{dt:.1f}s = {rate:.2f} G voxel-updates/s "
        f"({n_views/dt:.1f} maps/s), checksum {checksum:.0f}",
        flush=True,
    )
    if mesh and not os.environ.get("CAPSTONE_SKIP_MESH"):
        # Mesh a central crop ON DEVICE (round 5: backend='jax' + device
        # welding — compaction AND welding run on chip, so only the final
        # mesh crosses the tunnel; backend='auto' would pick the native
        # C++ walker, which needs the 512^3 crop on host first, ~537 MB
        # over this rig's link). Normals stay off here: they are the one
        # host-side stage (pipeline_e2e.py times them separately).
        c0 = (dims - 1) // 4
        crop = vol[c0 : 3 * c0, c0 : 3 * c0, c0 : 3 * c0]
        crop.block_until_ready()
        # Free the full fused volume before device meshing: at 1024^3 the
        # 4.3 GB volume + the crop + the extraction buffers exceed HBM
        # (measured OOM by 579 MB, 2026-08-20); only the crop is needed
        # from here on.
        del vol
        sub = VoxelGrid(
            dims=(2 * c0 + 1,) * 3,
            origin=tuple(np.array(grid.origin) + c0 * np.array(grid.spacing)),
            spacing=grid.spacing,
        )
        t_mc = time.time()
        m = extract_isosurface(sub, crop, iso=1.0, compute_normals=False,
                               backend="jax", weld_backend="device")
        print(f"  device MC: {time.time() - t_mc:.1f}s", flush=True)
        r = np.linalg.norm(m.points, axis=1)
        print(
            f"central-crop mesh: {m.num_triangles} tris, "
            f"median radius {np.median(r):.4f} (expect 1.0)",
            flush=True,
        )
    return checksum, rate


def main():
    args = sys.argv[1:]
    if args and args[0] == "hd":
        # North-star grid x HD maps through the HBM band modes.
        n_views = int(args[1]) if len(args) > 1 else 32
        dims = int(args[2]) if len(args) > 2 else 1025
        # 'rowsel' = the production route: _vmem_safe_mode picks the
        # band-count-optimal band-sweep mode (rowselh at 1920-wide).
        mode = os.environ.get("CAPSTONE_HD_MODE", "rowsel")
        fuse(n_views, dims, w=1920, h=1080, mode=mode, mesh=False)
        return
    if args and args[0] == "ckpt":
        # Mid-run checkpoint/resume drill on the HD path: straight run vs
        # save-at-half/reload/finish must agree bit for bit. 257^3 so the
        # full-volume D2H fits this rig's ~6 MB/s tunnel (64 MB).
        mode = os.environ.get("CAPSTONE_HD_MODE", "rowsel")
        c1, _ = fuse(16, 257, w=1920, h=1080, mode=mode, mesh=False)
        c2, _ = fuse(16, 257, w=1920, h=1080, mode=mode, mesh=False,
                     checkpoint_mid="/tmp/capstone_ckpt.npz")
        tag = "MATCH" if c1 == c2 else "MISMATCH"
        print(f"ckpt drill: straight {c1:.6g} resumed {c2:.6g} {tag}",
              flush=True)
        return
    n_views = int(args[0]) if args else 1000
    dims = int(args[1]) if len(args) > 1 else 1025
    fuse(n_views, dims)


if __name__ == "__main__":
    main()
