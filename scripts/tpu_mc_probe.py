"""Device-MC timing probe: cold vs warm extraction at 513^3 on the chip.

The e2e run C measured the device compaction path's FIRST call at 176.7 s
— dominated by XLA compiles for the 513^3 shapes on this 4-core host.
This probe separates compile from steady state: same volume, three timed
calls (host weld, device weld, then repeats), plus the native C++ walker
for reference. Soup order and welded meshes must agree across paths.
"""

import sys
import time

sys.path.insert(0, ".")

import os as _os
_os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/root/.jax_bench_cache")

import jax.numpy as jnp
import numpy as np

from cudadepthmapintegration_tpu.ops.marching_cubes import marching_cubes

def main():
    dim = int(sys.argv[1]) if len(sys.argv) > 1 else 513
    ax = np.linspace(-1.2, 1.2, dim, dtype=np.float32)
    # Device-side sphere field (avoid a 540 MB H2D for the input).
    axd = jnp.asarray(ax)
    zz = axd[:, None, None]; yy = axd[None, :, None]; xx = axd[None, None, :]
    pv = 1.0 - jnp.sqrt(xx * xx + yy * yy + zz * zz)
    pv.block_until_ready()
    float(pv.sum())  # warm-up / force
    print(f"volume {dim}^3 on device", flush=True)

    results = {}
    for name, kw in (
        ("jax_host_weld", dict(backend="jax", weld_backend="host")),
        ("jax_device_weld", dict(backend="jax", weld_backend="device")),
        ("native_walker", dict(backend="native")),
    ):
        times = []
        m = None
        for rep in range(2):
            t0 = time.perf_counter()
            m = marching_cubes(pv, 0.0, ax, ax, ax, compute_normals=False,
                               **kw)
            times.append(time.perf_counter() - t0)
        results[name] = (m.points, m.triangles)
        print(f"  {name}: cold {times[0]:6.1f}s warm {times[1]:6.1f}s "
              f"({m.num_points} pts, {m.num_triangles} tris)", flush=True)
    a = results["jax_host_weld"]
    b = results["jax_device_weld"]
    print("  device weld BIT-equals host weld:",
          np.array_equal(a[0], b[0]) and np.array_equal(a[1], b[1]),
          flush=True)
    n = results["native_walker"]
    # The native walker interpolates in float64 (reference precision);
    # same topology, positions within fp32 rounding of the jax f32 path.
    print("  native topology equal + positions close:",
          np.array_equal(a[1], n[1])
          and bool(np.allclose(a[0], n[0], atol=1e-5)),
          flush=True)
    print("MC PROBE DONE", flush=True)


if __name__ == "__main__":
    main()
