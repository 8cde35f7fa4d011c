"""End-to-end pipeline wall time on hardware — BASELINE config 3.

One timed run of the WHOLE reference pipeline shape at 512^3 x 200 views
(``Reconstruction/main.cxx:119-198``: fuse -> cell->point -> always-written
.mha volume -> contour -> mesh write; then ``Coloration/main.cxx:69-100``:
mean/median/count coloration), through the production library surfaces:

* fusion: TSDFIntegrator(backend='pallas', group_fill) streamed in
  stream_batch=32 arrivals — the CLI default regime WITH the round-5
  cross-batch group filling;
* cell->point + marching cubes: device path with the round-5 device-side
  compaction (only the compacted soup leaves the chip);
* normals: host gradient (reuses the .mha phase's one volume download);
* coloration: colorize_points(backend='pallas') over all 200 views.

Per-phase wall seconds go to stdout and E2E_512.json. On this rig the
staging phases are tunnel-bound (~6 MB/s host<->device; CLAUDE.md) —
each phase record carries the bytes it moved so the device-time share is
recoverable; a production TPU VM moves the same bytes at GB/s.

Run: python scripts/pipeline_e2e.py [dims] [n_views]  (defaults 513 200)
"""

import json
import os
import sys
import time

sys.path.insert(0, ".")

import os as _os
_os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/root/.jax_bench_cache")

import jax.numpy as jnp
import numpy as np

from cudadepthmapintegration_tpu.core import RayPotential, VoxelGrid
from cudadepthmapintegration_tpu.io.mha import write_mha
from cudadepthmapintegration_tpu.io.polydata import write_vtp
from cudadepthmapintegration_tpu.ops.cell_to_point import cell_to_point
from cudadepthmapintegration_tpu.ops.coloration import colorize_points
from cudadepthmapintegration_tpu.ops.integrate import TSDFIntegrator
from cudadepthmapintegration_tpu.ops.marching_cubes import (
    _weld_triangle_soup,
    marching_cubes,
)
from cudadepthmapintegration_tpu.ops.normals import (
    normals_for_edge_keys,
    transform_normals,
)
from cudadepthmapintegration_tpu.testing import orbit_cameras, render_sphere_view

PHASES = {}


def phase(name, mb=None):
    class _P:
        def __enter__(self):
            self.t0 = time.perf_counter()
            print(f"[{name}] ...", flush=True)
            return self

        def __exit__(self, *exc):
            dt = time.perf_counter() - self.t0
            PHASES[name] = {"s": round(dt, 2)}
            if mb is not None:
                PHASES[name]["mb_moved"] = round(mb, 1)
            print(f"[{name}] {dt:.2f}s", flush=True)

    return _P()


def main():
    dims = int(sys.argv[1]) if len(sys.argv) > 1 else 513
    n_views = int(sys.argv[2]) if len(sys.argv) > 2 else 200
    w = h = 512
    out_dir = os.environ.get("E2E_OUT", "/tmp/e2e")
    os.makedirs(out_dir, exist_ok=True)

    grid = VoxelGrid(dims=(dims,) * 3, origin=(-1.63, -1.61, -1.59),
                     spacing=(3.2 / (dims - 1),) * 3)
    params = RayPotential(thick=2.0 * grid.spacing[0], rho=0.8, eta=0.03,
                          delta=8.0 * grid.spacing[0])

    with phase("render_host"):
        cams = orbit_cameras(n_views, 4.0, focal=300.0, width=w,
                             image_height=h)
        views = [render_sphere_view(c, w, h, radius=1.0, background=-1.0)
                 for c in cams]

    # Throwaway warm-up op: the first device op of a fresh process pays
    # 60-500 s of session setup on this rig (CLAUDE.md round-4 notes).
    with phase("device_warmup"):
        float(jnp.zeros((8, 128)).sum())

    depth_mb = n_views * w * h * 4 / 1e6
    with phase("fuse_streamed", mb=depth_mb):
        integ = TSDFIntegrator(grid, params, backend="pallas",
                               view_batch=8, group_fill=32)
        integ.reset()
        for s in range(0, n_views, 32):
            integ.integrate(views[s:s + 32])
        integ.flush()
        checksum = float(jnp.asarray(integ.volume).sum())
    print(f"  fused checksum {checksum:.6g}, sweeps {integ.volume_sweeps}",
          flush=True)

    with phase("cell_to_point"):
        pv_dev = cell_to_point(jnp.asarray(integ.volume))
        pv_dev.block_until_ready()

    pv_mb = pv_dev.size * 4 / 1e6
    with phase("volume_d2h", mb=pv_mb):
        pv_host = np.asarray(pv_dev)

    with phase("write_mha"):
        write_mha(os.path.join(out_dir, "meta_image_volume.mha"),
                  pv_host.astype(np.float64), origin=grid.origin,
                  spacing=grid.spacing, compress=True)

    with phase("marching_cubes"):
        # backend='jax' forces the DEVICE compaction path (auto would pick
        # the native C++ walker over the host copy cached by volume_d2h —
        # also fast, but this times the TPU-resident extraction).
        xs, ys, zs = grid.point_axes(np.float32)
        soup_verts, soup_keys = marching_cubes(
            pv_dev, 1.0, xs, ys, zs, backend="jax", _return_soup=True)
        mesh, uniq = _weld_triangle_soup(soup_verts, soup_keys, grid.matrix,
                                         return_keys=True)
    print(f"  mesh: {mesh.num_points} pts, {mesh.num_triangles} tris",
          flush=True)

    with phase("normals_host"):
        nrm = normals_for_edge_keys(pv_host, xs, ys, zs, uniq, 1.0)
        mesh.point_data["Normals"] = transform_normals(nrm, grid.matrix)
        mesh.point_data["reconstruction_scalar"] = np.full(
            mesh.num_points, 1.0, np.float64)
        mesh.active_scalars = "reconstruction_scalar"

    color_mb = n_views * w * h * 3 / 1e6
    with phase("colorize", mb=color_mb):
        mean, med, count = colorize_points(
            mesh.points, views, backend="pallas")
        mesh.point_data["MeanColoration"] = mean
        mesh.point_data["MedianColoration"] = med
        mesh.point_data["NbProjectedDepthMap"] = count.astype(np.int32)

    with phase("write_vtp"):
        write_vtp(os.path.join(out_dir, "mesh.vtp"), mesh)

    r = np.linalg.norm(mesh.points, axis=1)
    gates = {
        "mesh_radius_ok": bool(abs(float(np.median(r)) - 1.0) < 0.02),
        "coloration_hit_frac": float((count > 0).mean()),
        "normals_unit": bool(np.allclose(
            np.linalg.norm(mesh.point_data["Normals"], axis=1), 1.0,
            atol=1e-3)),
    }
    total = sum(p["s"] for p in PHASES.values())
    rec = {
        "config": f"{dims - 1}^3 x {n_views} views {w}x{h} (BASELINE cfg 3)",
        "phases": PHASES,
        "total_s": round(total, 1),
        "mesh": {"points": mesh.num_points, "tris": mesh.num_triangles,
                 "median_radius": round(float(np.median(r)), 4)},
        "volume_checksum": checksum,
        "gates": gates,
        "note": ("staging/D2H phases are tunnel-bound on this rig "
                 "(~6 MB/s); mb_moved recovers the device-time share"),
    }
    with open("E2E_512.json", "w") as f:
        f.write(json.dumps(rec) + "\n")
    print(json.dumps(rec), flush=True)


if __name__ == "__main__":
    main()
