"""Decision probe for the compact-miss worklist (VERDICT r3 item 3).

The idea under test: emit the (voxel, view) pairs the k static select
passes miss (14.4% of pairs = ~0.62e9 @512^3 x 32, carrying the ~360 ms
in-kernel remainder walk) as a compacted list, serve them with a
point-tile gather kernel (the coloration_pallas.py machine), and
scatter-add the potentials back.

Any such design is bounded below by three measurable primitive rates at
the REAL scale — this probe measures them on hardware so the build/kill
decision is a recorded number, like every other docs/KERNEL.md probe:

1. COMPACTION: indices of set elements of a 512^3 miss mask via the
   XLA idiom (cumsum + fixed-capacity scatter). The kernel cannot emit
   compacted lists itself (no in-kernel atomics / dynamic output shapes
   on this toolchain), so this XLA stage is unavoidable.
2. SERVE: per-pair gather+potential at list shape. Proxied by the
   measured coloration-kernel rate (0.33 G samples/s structural floor,
   docs/KERNEL.md) — re-measured here at the worklist's tile shape via
   a pure XLA take (the serving kernel could at best approach Mosaic
   gather rates IF pairs arrive v-sorted, which needs a 0.62e9-key sort:
   also timed).
3. SCATTER-BACK: jnp.add.at-style scatter-add of N pair-potentials into
   the 135M-voxel volume.

Walk-replacement budget: ~360 ms for 0.62e9 pairs -> every stage must
exceed ~1.7 G pair/s COMBINED. Scales tested are 1/8 of production
(memory headroom); rates are what matter.
"""

import sys
import time

sys.path.insert(0, ".")

import jax
import jax.numpy as jnp
import numpy as np


def bench(fn, *args, reps=3):
    out = fn(*args)
    jax.tree_util.tree_map(
        lambda x: float(jnp.asarray(x).ravel()[0].astype(jnp.float32)), out
    )
    best = 1e9
    for _ in range(reps):
        t0 = time.perf_counter()
        out = fn(*args)
        jax.tree_util.tree_map(
            lambda x: float(jnp.asarray(x).ravel()[0].astype(jnp.float32)),
            out,
        )
        best = min(best, time.perf_counter() - t0)
    return best


def main():
    print(f"devices: {jax.devices()}", flush=True)
    rng = np.random.default_rng(0)

    # --- 1. compaction: 512^3/8 mask (16.9M voxels, 14.4% set) ---------
    n_vox = (512 ** 3) // 8
    frac = 0.144
    mask = jnp.asarray(rng.random(n_vox) < frac)
    cap = int(n_vox * 0.25)  # static capacity bucket

    @jax.jit
    def compact(m):
        pos = jnp.cumsum(m.astype(jnp.int32)) - 1
        idx = jnp.where(m, pos, cap)  # overflow slot
        out = jnp.zeros(cap + 1, jnp.int32).at[idx].set(
            jnp.arange(n_vox, dtype=jnp.int32), mode="drop"
        )
        return out[:cap], pos[-1] + 1

    t = bench(compact, mask)
    print(f"  compact {n_vox / 1e6:.0f}M mask -> {frac:.0%} idx: "
          f"{t * 1e3:7.1f} ms  ({n_vox / t / 1e9:5.2f} G elem/s)",
          flush=True)

    # --- 1b. sort (needed for v-coherent serving windows) --------------
    n_pairs = int(0.62e9) // 8  # 77.5M pairs at 1/8 scale
    keys = jnp.asarray(rng.integers(0, 1 << 20, n_pairs, dtype=np.int32))

    @jax.jit
    def sortkeys(k):
        return jnp.sort(k)

    t = bench(sortkeys, keys)
    print(f"  sort {n_pairs / 1e6:.0f}M keys: {t * 1e3:7.1f} ms  "
          f"({n_pairs / t / 1e9:5.2f} G key/s)", flush=True)

    # --- 2. serve: gather depth at per-pair (v,u) via XLA take ---------
    depth = jnp.asarray(rng.random((1088, 1920), np.float32))
    flat_idx = jnp.asarray(
        rng.integers(0, 1088 * 1920, n_pairs, dtype=np.int32))

    @jax.jit
    def serve(d, i):
        g = jnp.take(d.ravel(), i)
        return jnp.sum(g)

    t = bench(serve, depth, flat_idx)
    print(f"  serve(list gather) {n_pairs / 1e6:.0f}M pairs: "
          f"{t * 1e3:7.1f} ms  ({n_pairs / t / 1e9:5.2f} G pair/s)",
          flush=True)

    # --- 3. scatter-add back into the volume ---------------------------
    vol = jnp.zeros(n_vox, jnp.float32)
    tgt = jnp.asarray(rng.integers(0, n_vox, n_pairs, dtype=np.int32))
    vals = jnp.asarray(rng.random(n_pairs, np.float32))

    @jax.jit
    def scatter(v, i, x):
        return v.at[i].add(x)

    t = bench(scatter, vol, tgt, vals)
    print(f"  scatter-add {n_pairs / 1e6:.0f}M pairs: {t * 1e3:7.1f} ms  "
          f"({n_pairs / t / 1e9:5.2f} G pair/s)", flush=True)

    print("  budget: walk does 0.62 G pairs in ~360 ms = 1.72 G pair/s; "
          "each stage above must beat that COMBINED at 8x these times.",
          flush=True)
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
