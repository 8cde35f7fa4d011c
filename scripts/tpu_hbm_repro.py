"""Bisect the Mosaic remote-compile 500 of the HBM depth modes.

Variant ladder, each a tiny standalone pallas_call compiled on the real
chip (one process; each step try/excepted and flushed so the log shows
exactly which construct kills the compiler):

  v1  whole-array ANY input ref; DMA src .at[view, :, ds, ds] (dynamic
      leading index from program_id) -> (3, wr, wc) VMEM scratch.
  v2  ANY input WITH a BlockSpec index map (block (1, 3, hp, wp)); DMA
      src .at[0, :, ds, ds] (static leading indices).
  v3  like v2 but one DMA per plane: .at[0, i, ds, ds] -> (wr, wc).
  v4  like v2 plus a second DMA inside a lax.while_loop body (the
      remainder-walk pattern).
  v5  v2 + a one-hot select dot against the scratch window (the actual
      consumer shape).
"""

import sys
import time

sys.path.insert(0, ".")

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

V, PL3, HP, WP = 4, 3, 512, 512
WR, WC = 64, 256
SJ = 8


def run_case(name, fn):
    t0 = time.time()
    try:
        out = fn()
        jax.block_until_ready(out)
        s = float(np.asarray(out).sum())
        print(f"PASS {name}: sum={s:.6g} [{time.time() - t0:.0f}s]",
              flush=True)
        return True
    except Exception as e:
        print(f"FAIL {name}: [{type(e).__name__}] {str(e)[:200]} "
              f"[{time.time() - t0:.0f}s]", flush=True)
        return False


def depth_data():
    rng = np.random.default_rng(0)
    return rng.normal(size=(V, PL3, HP, WP)).astype(np.float32)


def v1():
    def kernel(d_ref, o_ref, scr, sem):
        view = pl.program_id(0)
        v0 = jnp.int32(8) * (view % 2)
        u0 = jnp.int32(128) * (view % 2)
        dma = pltpu.make_async_copy(
            d_ref.at[view, :, pl.ds(v0, WR), pl.ds(u0, WC)], scr, sem
        )
        dma.start()
        dma.wait()
        o_ref[0] = scr[0, :SJ, :128] + scr[1, :SJ, :128] + scr[2, :SJ, :128]

    return pl.pallas_call(
        kernel,
        out_shape=jax.ShapeDtypeStruct((V, SJ, 128), jnp.float32),
        grid=(V,),
        in_specs=[pl.BlockSpec(memory_space=pl.ANY)],
        out_specs=pl.BlockSpec((1, SJ, 128), lambda v: (v, 0, 0),
                               memory_space=pltpu.VMEM),
        scratch_shapes=[pltpu.VMEM((PL3, WR, WC), jnp.float32),
                        pltpu.SemaphoreType.DMA(())],
    )(depth_data())


def _blocked(kernel_body, scratch_shapes):
    # ANY space requires whole-array blocks + trivial index map (measured:
    # the JAX lowering rejects anything else) — kernels index .at[view].
    return pl.pallas_call(
        kernel_body,
        out_shape=jax.ShapeDtypeStruct((V, SJ, 128), jnp.float32),
        grid=(V,),
        in_specs=[pl.BlockSpec(memory_space=pl.ANY)],
        out_specs=pl.BlockSpec((1, SJ, 128), lambda v: (v, 0, 0),
                               memory_space=pltpu.VMEM),
        scratch_shapes=scratch_shapes,
    )(depth_data())


def v2():
    def kernel(d_ref, o_ref, scr, sem):
        view = pl.program_id(0)
        v0 = jnp.int32(8) * (view % 2)
        u0 = jnp.int32(128) * (view % 2)
        dma = pltpu.make_async_copy(
            d_ref.at[view, :, pl.ds(v0, WR), pl.ds(u0, WC)], scr, sem
        )
        dma.start()
        dma.wait()
        o_ref[0] = scr[0, :SJ, :128] + scr[1, :SJ, :128] + scr[2, :SJ, :128]

    return _blocked(kernel, [pltpu.VMEM((PL3, WR, WC), jnp.float32),
                             pltpu.SemaphoreType.DMA(())])


def v3():
    def kernel(d_ref, o_ref, s0, s1, s2, sem):
        view = pl.program_id(0)
        v0 = jnp.int32(8) * (view % 2)
        u0 = jnp.int32(128) * (view % 2)
        acc = None
        for i, scr in enumerate((s0, s1, s2)):
            dma = pltpu.make_async_copy(
                d_ref.at[view, i, pl.ds(v0, WR), pl.ds(u0, WC)], scr,
                sem.at[i],
            )
            dma.start()
        for i, scr in enumerate((s0, s1, s2)):
            pltpu.make_async_copy(
                d_ref.at[view, i, pl.ds(v0, WR), pl.ds(u0, WC)], scr,
                sem.at[i],
            ).wait()
            a = scr[:SJ, :128]
            acc = a if acc is None else acc + a
        o_ref[0] = acc

    return _blocked(
        kernel,
        [pltpu.VMEM((WR, WC), jnp.float32),
         pltpu.VMEM((WR, WC), jnp.float32),
         pltpu.VMEM((WR, WC), jnp.float32),
         pltpu.SemaphoreType.DMA((3,))],
    )


def v4():
    def kernel(d_ref, o_ref, scr, rem, sem):
        view = pl.program_id(0)
        v0 = jnp.int32(8) * (view % 2)
        u0 = jnp.int32(128) * (view % 2)
        dma = pltpu.make_async_copy(
            d_ref.at[view, :, pl.ds(v0, WR), pl.ds(u0, WC)], scr, sem.at[0]
        )
        dma.start()
        dma.wait()
        base = scr[0, :SJ, :128] + scr[1, :SJ, :128] + scr[2, :SJ, :128]

        def cond(c):
            return c[0] < 2 + (view % 2)

        def body(c):
            i, acc = c
            d2 = pltpu.make_async_copy(
                d_ref.at[view, :, pl.ds(i * 8, 8), pl.ds(jnp.int32(0), 128)],
                rem, sem.at[1],
            )
            d2.start()
            d2.wait()
            return i + 1, acc + rem[0] + rem[1] + rem[2]

        _, out = jax.lax.while_loop(
            cond, body, (jnp.int32(0), jnp.zeros((8, 128), jnp.float32))
        )
        o_ref[0] = base + out[:SJ]

    return _blocked(
        kernel,
        [pltpu.VMEM((PL3, WR, WC), jnp.float32),
         pltpu.VMEM((PL3, 8, 128), jnp.float32),
         pltpu.SemaphoreType.DMA((2,))],
    )


def v5():
    def kernel(d_ref, o_ref, scr, sem):
        view = pl.program_id(0)
        v0 = jnp.int32(8) * (view % 2)
        u0 = jnp.int32(128) * (view % 2)
        dma = pltpu.make_async_copy(
            d_ref.at[view, :, pl.ds(v0, WR), pl.ds(u0, WC)], scr, sem
        )
        dma.start()
        dma.wait()
        iota_r = jax.lax.broadcasted_iota(jnp.int32, (SJ, WR), 1)
        p = (iota_r == (view % 3)).astype(jnp.float32)
        acc = None
        for i in range(3):
            win = scr[i, :, 0:128]
            a = jax.lax.dot_general(
                p, win, (((1,), (0,)), ((), ())),
                precision=jax.lax.Precision.DEFAULT,
                preferred_element_type=jnp.float32,
            )
            acc = a if acc is None else acc + a
        o_ref[0] = acc

    return _blocked(kernel, [pltpu.VMEM((PL3, WR, WC), jnp.float32),
                             pltpu.SemaphoreType.DMA(())])


def v8():
    """v4's DMA+while nested INSIDE a fori_loop (the kernel's jt loop)."""
    def kernel(d_ref, o_ref, scr, rem, sem):
        view = pl.program_id(0)

        def jt_body(jt, _):
            v0 = jnp.int32(8) * ((view + jt) % 2)
            u0 = jnp.int32(128) * (view % 2)
            dma = pltpu.make_async_copy(
                d_ref.at[view, :, pl.ds(v0, WR), pl.ds(u0, WC)], scr,
                sem.at[0],
            )
            dma.start()
            dma.wait()
            base = (scr[0, :SJ, :128] + scr[1, :SJ, :128]
                    + scr[2, :SJ, :128])

            def cond(c):
                return c[0] < 2 + (view % 2)

            def body(c):
                i, acc = c
                d2 = pltpu.make_async_copy(
                    d_ref.at[view, :, pl.ds(i * 8, 8),
                             pl.ds(jnp.int32(0), 128)],
                    rem, sem.at[1],
                )
                d2.start()
                d2.wait()
                return i + 1, acc + rem[0] + rem[1] + rem[2]

            _, out = jax.lax.while_loop(
                cond, body, (jnp.int32(0), jnp.zeros((8, 128), jnp.float32))
            )
            o_ref[0] = base + out[:SJ]
            return 0

        jax.lax.fori_loop(0, 3, jt_body, 0)

    return _blocked(
        kernel,
        [pltpu.VMEM((PL3, WR, WC), jnp.float32),
         pltpu.VMEM((PL3, 8, 128), jnp.float32),
         pltpu.SemaphoreType.DMA((2,))],
    )


def v9():
    """Nested while-in-while with the inner DMA + pl.multiple_of indices
    (the remainder-walk shape) + a take_along_axis consumer."""
    def kernel(d_ref, o_ref, scr, rem, sem):
        view = pl.program_id(0)
        dma = pltpu.make_async_copy(
            d_ref.at[view, :, pl.ds(jnp.int32(0), WR),
                     pl.ds(jnp.int32(0), WC)], scr, sem.at[0],
        )
        dma.start()
        dma.wait()
        idx = jax.lax.broadcasted_iota(jnp.int32, (SJ, 128), 1) % 7

        def row_cond(c):
            return c[0] < 16 + 8 * (view % 2)

        def row_body(c):
            rs, acc = c

            def col_cond(cc):
                return cc[0] < 256

            def col_body(cc):
                cs, cacc = cc
                d2 = pltpu.make_async_copy(
                    d_ref.at[view, :, pl.ds(pl.multiple_of(rs, 8), 8),
                             pl.ds(pl.multiple_of(cs, 128), 128)],
                    rem, sem.at[1],
                )
                d2.start()
                d2.wait()
                win = rem[0] + rem[1] + rem[2]
                g = jnp.take_along_axis(
                    jnp.broadcast_to(win[0][None, :], (SJ, 128)), idx,
                    axis=1,
                )
                return cs + 128, cacc + g

            _, acc = jax.lax.while_loop(
                col_cond, col_body, (jnp.int32(0), acc)
            )
            return rs + 8, acc

        _, out = jax.lax.while_loop(
            row_cond, row_body,
            (jnp.int32(0), jnp.zeros((SJ, 128), jnp.float32)),
        )
        o_ref[0] = out + scr[0, :SJ, :128]

    return _blocked(
        kernel,
        [pltpu.VMEM((PL3, WR, WC), jnp.float32),
         pltpu.VMEM((PL3, 8, 128), jnp.float32),
         pltpu.SemaphoreType.DMA((2,))],
    )


def _real(mode="rowsel3h", **flags):
    import cudadepthmapintegration_tpu.kernels.integrate_pallas as KP
    from cudadepthmapintegration_tpu.core import RayPotential, VoxelGrid
    from cudadepthmapintegration_tpu.testing import sphere_scene

    old = {k: getattr(KP, k) for k in flags}
    for k, v in flags.items():
        setattr(KP, k, v)
    try:
        views = sphere_scene(n_views=4, width=256, height=192, focal=150.0)
        grid = VoxelGrid(dims=(65, 65, 65), origin=(-1.63, -1.61, -1.59),
                         spacing=(0.05,) * 3)
        params = RayPotential(thick=0.05, rho=0.8, eta=0.03, delta=0.2)
        return KP.integrate_views_oriented(
            np.zeros(grid.volume_shape, np.float32), grid, views, params,
            mode=mode, window_rows=64, rowsel_passes=2, subtile_rows=16,
        )
    finally:
        for k, v in old.items():
            setattr(KP, k, v)


def m1():
    return _real()  # band-sweep rowsel3h


def m4():
    return _real(mode="rowselh")  # band-sweep single-plane


def v7():
    """The REAL kernel (mode='rowsel3h') at a small geometry."""
    from cudadepthmapintegration_tpu.core import RayPotential, VoxelGrid
    from cudadepthmapintegration_tpu.kernels.integrate_pallas import (
        integrate_views_oriented,
    )
    from cudadepthmapintegration_tpu.testing import sphere_scene

    views = sphere_scene(n_views=4, width=256, height=192, focal=150.0)
    grid = VoxelGrid(dims=(65, 65, 65), origin=(-1.63, -1.61, -1.59),
                     spacing=(0.05,) * 3)
    params = RayPotential(thick=0.05, rho=0.8, eta=0.03, delta=0.2)
    return integrate_views_oriented(
        np.zeros(grid.volume_shape, np.float32), grid, views, params,
        mode="rowsel3h", window_rows=64, rowsel_passes=2, subtile_rows=16,
    )


def v11():
    """DMA offsets derived from VECTOR reductions (the real kernel's
    anchor pattern) instead of program_id arithmetic."""
    def kernel(d_ref, o_ref, scr, sem):
        view = pl.program_id(0)
        vals = jax.lax.broadcasted_iota(jnp.int32, (SJ, 128), 1) + view
        v_lo = jnp.min(jnp.where(vals > 0, vals, 1 << 30))
        u_lo = jnp.min(vals)
        v0 = jnp.clip((v_lo // 8) * 8, 0, HP - WR)
        u0 = jnp.clip((u_lo // 128) * 128, 0, WP - WC)
        dma = pltpu.make_async_copy(
            d_ref.at[view, :, pl.ds(v0, WR), pl.ds(u0, WC)], scr, sem
        )
        dma.start()
        dma.wait()
        o_ref[0] = scr[0, :SJ, :128] + scr[1, :SJ, :128] + scr[2, :SJ, :128]

    return _blocked(kernel, [pltpu.VMEM((PL3, WR, WC), jnp.float32),
                             pltpu.SemaphoreType.DMA(())])


def v12():
    """v11 + the main kernel's volume in/out alias + pl.when init +
    accumulation (composite closest to m4 minus tables/projection)."""
    def kernel(d_ref, vol_ref, o_ref, scr, sem):
        view = pl.program_id(1)

        @pl.when(view == 0)
        def _():
            o_ref[:] = vol_ref[:]

        vals = jax.lax.broadcasted_iota(jnp.int32, (SJ, 128), 1) + view
        v_lo = jnp.min(jnp.where(vals > 0, vals, 1 << 30))
        v0 = jnp.clip((v_lo // 8) * 8, 0, HP - WR)
        dma = pltpu.make_async_copy(
            d_ref.at[view, :, pl.ds(v0, WR), pl.ds(jnp.int32(0), WC)],
            scr, sem,
        )
        dma.start()
        dma.wait()
        o_ref[0] += scr[0, :SJ, :128]

    vol = np.zeros((4, SJ, 128), np.float32)
    return pl.pallas_call(
        kernel,
        out_shape=jax.ShapeDtypeStruct((4, SJ, 128), jnp.float32),
        grid=(4, V),
        in_specs=[pl.BlockSpec(memory_space=pl.ANY),
                  pl.BlockSpec((1, SJ, 128), lambda b, v: (b, 0, 0),
                               memory_space=pltpu.VMEM)],
        out_specs=pl.BlockSpec((1, SJ, 128), lambda b, v: (b, 0, 0),
                               memory_space=pltpu.VMEM),
        scratch_shapes=[pltpu.VMEM((PL3, WR, WC), jnp.float32),
                        pltpu.SemaphoreType.DMA(())],
        input_output_aliases={1: 0},
    )(depth_data(), vol)


def v13():
    """DMA offsets loaded from an SMEM INPUT ref at a DYNAMIC index (the
    real kernel's anch_ref[0, jt, abase] pattern, post-SMEM-anchor fix)."""
    def kernel(anch_ref, d_ref, o_ref, scr, sem):
        view = pl.program_id(0)

        def jt_body(jt, _):
            v0 = anch_ref[0, jt, 2 * view]
            u0 = anch_ref[0, jt, 2 * view + 1]
            dma = pltpu.make_async_copy(
                d_ref.at[view, :, pl.ds(v0, WR), pl.ds(u0, WC)], scr, sem
            )
            dma.start()
            dma.wait()
            o_ref[0] = (scr[0, :SJ, :128] + scr[1, :SJ, :128]
                        + scr[2, :SJ, :128])
            return 0

        jax.lax.fori_loop(0, 3, jt_body, 0)

    anch = np.zeros((1, 3, 2 * V), np.int32)
    anch[0, :, 0::2] = 8
    anch[0, :, 1::2] = 128
    return pl.pallas_call(
        kernel,
        out_shape=jax.ShapeDtypeStruct((V, SJ, 128), jnp.float32),
        grid=(V,),
        in_specs=[pl.BlockSpec((1, 3, 2 * V), lambda v: (0, 0, 0),
                               memory_space=pltpu.SMEM),
                  pl.BlockSpec(memory_space=pl.ANY)],
        out_specs=pl.BlockSpec((1, SJ, 128), lambda v: (v, 0, 0),
                               memory_space=pltpu.VMEM),
        scratch_shapes=[pltpu.VMEM((PL3, WR, WC), jnp.float32),
                        pltpu.SemaphoreType.DMA(())],
    )(jnp.asarray(anch), depth_data())


def v14():
    """while-loop BOUNDS from vector reductions (the walk's rv_hi/ru_hi)
    with scalar-carry DMA offsets in the body — the remaining untested
    construct of the real kernel's remainder walk."""
    def kernel(d_ref, o_ref, rem, sem):
        view = pl.program_id(0)
        vals = jax.lax.broadcasted_iota(jnp.int32, (SJ, 128), 1) % 17
        rv_hi = jnp.max(jnp.where(vals > 5, vals, -1))  # vector-derived
        ru_hi = jnp.max(vals)

        def row_cond(c):
            return c[0] <= rv_hi

        def row_body(c):
            rs, acc = c

            def col_cond(cc):
                return cc[0] <= ru_hi

            def col_body(cc):
                cs, cacc = cc
                d2 = pltpu.make_async_copy(
                    d_ref.at[view, :, pl.ds(pl.multiple_of(rs * 8, 8), 8),
                             pl.ds(pl.multiple_of(cs * 128, 128), 128)],
                    rem, sem,
                )
                d2.start()
                d2.wait()
                return cs + 1, cacc + rem[0] + rem[1] + rem[2]

            _, acc = jax.lax.while_loop(
                col_cond, col_body, (jnp.int32(0), acc)
            )
            return rs + 1, acc

        _, out = jax.lax.while_loop(
            row_cond, row_body,
            (jnp.int32(0), jnp.zeros((8, 128), jnp.float32)),
        )
        o_ref[0] = out[:SJ]

    return _blocked(
        kernel,
        [pltpu.VMEM((PL3, 8, 128), jnp.float32),
         pltpu.SemaphoreType.DMA(())],
    )


def v15():
    """v13 + v14 composite: SMEM-input anchors feed the big-window DMA,
    vector-derived bounds drive the walk, plus a select-dot consumer —
    the closest standalone mirror of _gather_pixels_hbm."""
    def kernel(anch_ref, d_ref, o_ref, scr, rem, sem):
        view = pl.program_id(0)

        def jt_body(jt, _):
            v0 = anch_ref[0, jt, 2 * view]
            u0 = anch_ref[0, jt, 2 * view + 1]
            dma = pltpu.make_async_copy(
                d_ref.at[view, :, pl.ds(v0, WR), pl.ds(u0, WC)], scr,
                sem.at[0],
            )
            dma.start()
            vals = jax.lax.broadcasted_iota(jnp.int32, (SJ, 128), 1) % 17
            rv_hi = jnp.max(jnp.where(vals > 5, vals * 8, -1))
            dma.wait()
            iota_r = jax.lax.broadcasted_iota(jnp.int32, (SJ, WR), 1)
            p = (iota_r == (view % 3)).astype(jnp.float32)
            acc = None
            for i in range(3):
                a = jax.lax.dot_general(
                    p, scr[i, :, 0:128], (((1,), (0,)), ((), ())),
                    precision=jax.lax.Precision.DEFAULT,
                    preferred_element_type=jnp.float32,
                )
                acc = a if acc is None else acc + a

            def row_cond(c):
                return c[0] <= rv_hi

            def row_body(c):
                rs, racc = c
                d2 = pltpu.make_async_copy(
                    d_ref.at[view, :, pl.ds(pl.multiple_of(rs, 8), 8),
                             pl.ds(jnp.int32(0), 128)],
                    rem, sem.at[1],
                )
                d2.start()
                d2.wait()
                win = rem[0] + rem[1] + rem[2]
                g = jnp.take_along_axis(
                    jnp.broadcast_to(win[0][None, :], (SJ, 128)),
                    vals % 128, axis=1,
                )
                return rs + 8, racc + g

            _, out = jax.lax.while_loop(
                row_cond, row_body,
                (v0, jnp.zeros((SJ, 128), jnp.float32)),
            )
            o_ref[0] = acc + out
            return 0

        jax.lax.fori_loop(0, 3, jt_body, 0)

    anch = np.zeros((1, 3, 2 * V), np.int32)
    anch[0, :, 0::2] = 8
    anch[0, :, 1::2] = 128
    return pl.pallas_call(
        kernel,
        out_shape=jax.ShapeDtypeStruct((V, SJ, 128), jnp.float32),
        grid=(V,),
        in_specs=[pl.BlockSpec((1, 3, 2 * V), lambda v: (0, 0, 0),
                               memory_space=pltpu.SMEM),
                  pl.BlockSpec(memory_space=pl.ANY)],
        out_specs=pl.BlockSpec((1, SJ, 128), lambda v: (v, 0, 0),
                               memory_space=pltpu.VMEM),
        scratch_shapes=[pltpu.VMEM((PL3, WR, WC), jnp.float32),
                        pltpu.VMEM((PL3, 8, 128), jnp.float32),
                        pltpu.SemaphoreType.DMA((2,))],
    )(jnp.asarray(anch), depth_data())


def v16a():
    """SMEM-input load at a PROGRAM-ID-only index (no fori carry in the
    index chain) -> DMA offset. Distinguishes 'SMEM loads can't feed DMA'
    from 'fori-carry-indexed SMEM loads can't feed DMA' (v13 had jt)."""
    def kernel(anch_ref, d_ref, o_ref, scr, sem):
        view = pl.program_id(0)
        v0 = anch_ref[0, 0, 2 * view]
        u0 = anch_ref[0, 0, 2 * view + 1]
        dma = pltpu.make_async_copy(
            d_ref.at[view, :, pl.ds(v0, WR), pl.ds(u0, WC)], scr, sem
        )
        dma.start()
        dma.wait()
        o_ref[0] = scr[0, :SJ, :128] + scr[1, :SJ, :128] + scr[2, :SJ, :128]

    anch = np.zeros((1, 3, 2 * V), np.int32)
    anch[0, :, 0::2] = 8
    anch[0, :, 1::2] = 128
    return pl.pallas_call(
        kernel,
        out_shape=jax.ShapeDtypeStruct((V, SJ, 128), jnp.float32),
        grid=(V,),
        in_specs=[pl.BlockSpec((1, 3, 2 * V), lambda v: (0, 0, 0),
                               memory_space=pltpu.SMEM),
                  pl.BlockSpec(memory_space=pl.ANY)],
        out_specs=pl.BlockSpec((1, SJ, 128), lambda v: (v, 0, 0),
                               memory_space=pltpu.VMEM),
        scratch_shapes=[pltpu.VMEM((PL3, WR, WC), jnp.float32),
                        pltpu.SemaphoreType.DMA(())],
    )(jnp.asarray(anch), depth_data())


def v16b():
    """SMEM-input load at a fully STATIC index -> DMA offset."""
    def kernel(anch_ref, d_ref, o_ref, scr, sem):
        view = pl.program_id(0)
        v0 = anch_ref[0, 0, 0]
        u0 = anch_ref[0, 0, 1]
        dma = pltpu.make_async_copy(
            d_ref.at[view, :, pl.ds(v0, WR), pl.ds(u0, WC)], scr, sem
        )
        dma.start()
        dma.wait()
        o_ref[0] = scr[0, :SJ, :128] + scr[1, :SJ, :128] + scr[2, :SJ, :128]

    anch = np.full((1, 3, 2 * V), 8, np.int32)
    return pl.pallas_call(
        kernel,
        out_shape=jax.ShapeDtypeStruct((V, SJ, 128), jnp.float32),
        grid=(V,),
        in_specs=[pl.BlockSpec((1, 3, 2 * V), lambda v: (0, 0, 0),
                               memory_space=pltpu.SMEM),
                  pl.BlockSpec(memory_space=pl.ANY)],
        out_specs=pl.BlockSpec((1, SJ, 128), lambda v: (v, 0, 0),
                               memory_space=pltpu.VMEM),
        scratch_shapes=[pltpu.VMEM((PL3, WR, WC), jnp.float32),
                        pltpu.SemaphoreType.DMA(())],
    )(jnp.asarray(anch), depth_data())


def v17():
    """Scalar-PREFETCH anchors (PrefetchScalarGridSpec — the blessed
    channel for scalars that drive addressing) -> DMA offset, index from
    program_id."""
    def kernel(anch_ref, d_ref, o_ref, scr, sem):
        view = pl.program_id(0)
        v0 = anch_ref[2 * view]
        u0 = anch_ref[2 * view + 1]
        dma = pltpu.make_async_copy(
            d_ref.at[view, :, pl.ds(v0, WR), pl.ds(u0, WC)], scr, sem
        )
        dma.start()
        dma.wait()
        o_ref[0] = scr[0, :SJ, :128] + scr[1, :SJ, :128] + scr[2, :SJ, :128]

    anch = np.zeros(2 * V, np.int32)
    anch[0::2] = 8
    anch[1::2] = 128
    return pl.pallas_call(
        kernel,
        out_shape=jax.ShapeDtypeStruct((V, SJ, 128), jnp.float32),
        grid_spec=pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=1,
            grid=(V,),
            in_specs=[pl.BlockSpec(memory_space=pl.ANY)],
            out_specs=pl.BlockSpec((1, SJ, 128), lambda v, sp: (v, 0, 0)),
            scratch_shapes=[pltpu.VMEM((PL3, WR, WC), jnp.float32),
                            pltpu.SemaphoreType.DMA(())],
        ),
    )(jnp.asarray(anch), depth_data())


def v18():
    """Window staging through the PIPELINE instead of manual DMA:
    pl.Element dims with a scalar-prefetch-driven index_map place a
    (WR, WC) window at a dynamic 8/128-aligned anchor per grid step.
    No make_async_copy in the kernel at all — if this compiles, the HBM
    modes can be rebuilt on it (anchors drive block fetches, the kernel
    consumes a VMEM window exactly like the whole-map modes)."""
    def kernel(anch_ref, d_ref, o_ref):
        del anch_ref
        o_ref[0] = (d_ref[0, 0, :SJ, :128] + d_ref[0, 1, :SJ, :128]
                    + d_ref[0, 2, :SJ, :128])

    anch = np.zeros((V, 2), np.int32)
    anch[:, 0] = 8
    anch[:, 1] = 128
    return pl.pallas_call(
        kernel,
        out_shape=jax.ShapeDtypeStruct((V, SJ, 128), jnp.float32),
        grid_spec=pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=1,
            grid=(V,),
            in_specs=[pl.BlockSpec(
                (pl.Element(1), pl.Element(PL3), pl.Element(WR),
                 pl.Element(WC)),
                lambda v, sp: (v, 0, sp[v, 0], sp[v, 1]),
            )],
            out_specs=pl.BlockSpec((1, SJ, 128), lambda v, sp: (v, 0, 0)),
        ),
    )(jnp.asarray(anch), depth_data())


def v19():
    """v18 + a select-dot consumer + a VMEM-local dynamic-ds walk over the
    staged window (the full _gather_pixels_multi machinery shape, minus
    whole-map residency) — the complete pipeline-staged HBM design."""
    def kernel(anch_ref, d_ref, o_ref):
        view = pl.program_id(0)
        iota_r = jax.lax.broadcasted_iota(jnp.int32, (SJ, WR), 1)
        p = (iota_r == (view % 3)).astype(jnp.float32)
        acc = None
        for i in range(3):
            a = jax.lax.dot_general(
                p, d_ref[0, i, :, 0:128], (((1,), (0,)), ((), ())),
                precision=jax.lax.Precision.DEFAULT,
                preferred_element_type=jnp.float32,
            )
            acc = a if acc is None else acc + a
        # VMEM-local walk with vector-derived bounds + dynamic ds reads
        # (legal in the whole-map modes; confirm against a pipelined
        # Element block).
        vals = jax.lax.broadcasted_iota(jnp.int32, (SJ, 128), 1) % 17
        rv_hi = jnp.max(jnp.where(vals > 5, vals, -1))

        def cond(c):
            return c[0] <= rv_hi

        def body(c):
            rs, racc = c
            win = d_ref[0, 0, pl.ds(pl.multiple_of(rs * 8 % WR, 8), 8),
                        0:128]
            g = jnp.take_along_axis(
                jnp.broadcast_to(win[0][None, :], (SJ, 128)),
                vals % 128, axis=1,
            )
            return rs + 1, racc + g

        _, out = jax.lax.while_loop(
            cond, body, (jnp.int32(0), jnp.zeros((SJ, 128), jnp.float32))
        )
        o_ref[0] = acc + out

    anch = np.zeros((V, 2), np.int32)
    anch[:, 0] = 8
    anch[:, 1] = 128
    return pl.pallas_call(
        kernel,
        out_shape=jax.ShapeDtypeStruct((V, SJ, 128), jnp.float32),
        grid_spec=pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=1,
            grid=(V,),
            in_specs=[pl.BlockSpec(
                (pl.Element(1), pl.Element(PL3), pl.Element(WR),
                 pl.Element(WC)),
                lambda v, sp: (v, 0, sp[v, 0], sp[v, 1]),
            )],
            out_specs=pl.BlockSpec((1, SJ, 128), lambda v, sp: (v, 0, 0)),
        ),
    )(jnp.asarray(anch), depth_data())


def v20():
    """BLOCKED dims with a DYNAMIC index_map reading scalar-prefetch
    anchors (the canonical block-sparse pattern: placement at block
    granularity, pipeline-managed). If this compiles, the HBM modes can
    stage full-width depth BANDS at dynamic band indices."""
    def kernel(anch_ref, d_ref, o_ref):
        del anch_ref
        o_ref[0] = (d_ref[0, 0, :SJ, :128] + d_ref[0, 1, :SJ, :128]
                    + d_ref[0, 2, :SJ, :128])

    anch = np.zeros((V,), np.int32)
    anch[:] = [0, 1, 2, 1]  # band index per view
    return pl.pallas_call(
        kernel,
        out_shape=jax.ShapeDtypeStruct((V, SJ, 128), jnp.float32),
        grid_spec=pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=1,
            grid=(V,),
            in_specs=[pl.BlockSpec(
                (1, PL3, WR, WP),
                lambda v, sp: (v, 0, sp[v], 0),
            )],
            out_specs=pl.BlockSpec((1, SJ, 128), lambda v, sp: (v, 0, 0)),
        ),
    )(jnp.asarray(anch), depth_data())


def v21():
    """Direct dynamic-ds vector LOAD from the pl.ANY (HBM) ref — no DMA,
    no staging. Expected to be rejected at lowering; recorded for the
    toolchain report."""
    def kernel(d_ref, o_ref):
        view = pl.program_id(0)
        vals = jax.lax.broadcasted_iota(jnp.int32, (SJ, 128), 1)
        v0 = jnp.max(jnp.where(vals > 5, vals % 16, 0)) * 8
        o_ref[0] = d_ref[view, 0, pl.ds(v0, SJ), 0:128]

    return pl.pallas_call(
        kernel,
        out_shape=jax.ShapeDtypeStruct((V, SJ, 128), jnp.float32),
        grid=(V,),
        in_specs=[pl.BlockSpec(memory_space=pl.ANY)],
        out_specs=pl.BlockSpec((1, SJ, 128), lambda v: (v, 0, 0),
                               memory_space=pltpu.VMEM),
    )(depth_data())


def main():
    print(f"devices: {jax.devices()}", flush=True)
    names = set(sys.argv[1:])
    for name, fn in (("v2-blockspec", v2),
                     ("v3-per-plane", v3), ("v4-while-dma", v4),
                     ("v5-select-dot", v5), ("v8-fori-dma", v8),
                     ("v9-nested-while-dma", v9),
                     ("m1-band-sweep", m1), ("m4-band-1plane", m4),
                     ("v11-vec-anchor-dma", v11),
                     ("v12-alias-accum", v12),
                     ("v13-smem-anchor-dma", v13),
                     ("v14-vec-bound-walk", v14),
                     ("v15-composite", v15),
                     ("v16a-smem-pid-dma", v16a),
                     ("v16b-smem-static-dma", v16b),
                     ("v17-prefetch-dma", v17),
                     ("v18-element-pipeline", v18),
                     ("v19-element-consumer", v19),
                     ("v20-blocked-dyn-map", v20),
                     ("v21-any-direct-load", v21),
                     ("v7-real-kernel", v7),
                     ("v1-dyn-lead", v1)):
        if names and name.split("-")[0] not in names:
            continue
        run_case(name, fn)
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
