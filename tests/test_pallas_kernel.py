"""Pallas integrate-kernel parity tests (interpreter mode on CPU).

Runs the exact kernel logic (windowed dynamic_gather, L-remainder walks,
orientation grouping) through the Pallas interpreter and compares against the
float64 NumPy oracle. On TPU hardware the same code path compiles via Mosaic;
interpret mode pins the algorithm, hardware runs pin the lowering.
"""

import numpy as np
import pytest

import cudadepthmapintegration_tpu.kernels.integrate_pallas as KP
from cudadepthmapintegration_tpu.core import RayPotential, VoxelGrid
from cudadepthmapintegration_tpu.ops import TSDFIntegrator, integrate_views_oracle
from cudadepthmapintegration_tpu.testing import sphere_scene

KP.INTERPRET = True

PARAMS = RayPotential(thick=0.1, rho=0.8, eta=0.03, delta=0.3)


def small_grid(dims=(17, 17, 17)):
    return VoxelGrid(dims=dims, origin=(-1.6, -1.6, -1.6), spacing=(0.2, 0.2, 0.2))


def test_oriented_matches_oracle():
    views = sphere_scene(n_views=4, width=144, height=64, focal=60.0)
    grid = small_grid()
    vol = np.zeros(grid.volume_shape, np.float32)
    got = np.asarray(
        KP.integrate_views_oriented(vol, grid, views, PARAMS)
    )
    exp = integrate_views_oracle(grid, views, PARAMS)
    err = np.abs(got - exp.astype(np.float32))
    assert (err > 1e-3).mean() == 0.0
    assert exp.max() > 0.5  # scene actually hit the grid


def test_tiny_windows_exercise_walk_fallback():
    # windows=(1, 1) forces most subtiles through the L-remainder while-walk;
    # results must be identical (windows affect speed, never values).
    views = sphere_scene(n_views=3, width=144, height=64, focal=60.0)
    grid = small_grid()
    vol = np.zeros(grid.volume_shape, np.float32)
    a = np.asarray(KP.integrate_views_oriented(vol, grid, views, PARAMS, windows=(1, 1)))
    b = np.asarray(KP.integrate_views_oriented(vol, grid, views, PARAMS, windows=(2, 2)))
    np.testing.assert_array_equal(a, b)


def test_best_cost_threshold_applied():
    views = sphere_scene(n_views=2, width=144, height=64, focal=60.0)
    grid = small_grid()
    vol = np.zeros(grid.volume_shape, np.float32)
    got = np.asarray(
        KP.integrate_views_oriented(
            vol, grid, views, PARAMS, threshold_best_cost=0.5
        )
    )
    exp = integrate_views_oracle(grid, views, PARAMS, threshold_best_cost=0.5)
    assert (np.abs(got - exp.astype(np.float32)) > 1e-3).mean() == 0.0


def test_integrator_backend_pallas():
    views = sphere_scene(n_views=3, width=144, height=64, focal=60.0)
    grid = small_grid()
    integ = TSDFIntegrator(grid, PARAMS, backend="pallas").reset()
    integ.integrate(views)
    got = integ.result()
    exp = integrate_views_oracle(grid, views, PARAMS)
    assert (np.abs(got - exp.astype(np.float32)) > 1e-3).mean() == 0.0
    assert integ.views_fused == 3


def test_pallas_backend_rejects_float64():
    with pytest.raises(ValueError, match="float32"):
        TSDFIntegrator(small_grid(), PARAMS, dtype=np.float64, backend="pallas")


def test_axis_permutation_picks_identity_for_canonical_cam():
    # Camera looking along -y with u = +x, v = -z: lane should be x (axis 0),
    # sublane the viewing axis y (axis 1), k the remaining z.
    rot = np.array([[1.0, 0.0, 0.0], [0.0, 0.0, -1.0], [0.0, -1.0, 0.0]])
    k, s, l = KP.best_axis_permutation(rot)
    assert l == 0 and s == 1 and k == 2


def test_view_padding_adds_inert_views():
    tx = np.zeros((3, 4, 128), np.float32)
    ty = np.zeros((3, 4, 16), np.float32)
    tz = np.zeros((3, 4, 16), np.float32)
    tc = np.zeros((3, 4), np.float32)
    depths = np.zeros((3, 8, 128), np.float32)
    txp, typ, tzp, tcp, dp = KP._pad_views_invalid(tx, ty, tz, tc, depths, 8)
    assert txp.shape[0] == 8 and dp.shape[0] == 8
    assert (tcp[3:, 2] == -1e9).all()  # poisoned hom-z => always invalid
    assert (dp[3:] == -1.0).all()


def test_rowsel_matches_windows_mode_exactly():
    """v2 (one-hot-matmul row selection) and the round-1 windowed kernel
    must agree bit-for-bit — both are exact gathers."""
    views = sphere_scene(n_views=3, width=144, height=64, focal=60.0)
    grid = small_grid()
    vol = np.zeros(grid.volume_shape, np.float32)
    a = np.asarray(
        KP.integrate_views_oriented(vol, grid, views, PARAMS, mode="rowsel")
    )
    b = np.asarray(
        KP.integrate_views_oriented(vol, grid, views, PARAMS, mode="windows")
    )
    np.testing.assert_array_equal(a, b)


def test_rowsel_degenerate_tunables_hit_remainder_walk():
    """window_rows=8 / rowsel_passes=1 push most voxels through the
    uncovered-bbox while-walk; results must be identical (tunables affect
    speed, never values)."""
    views = sphere_scene(n_views=3, width=144, height=64, focal=60.0)
    grid = small_grid()
    vol = np.zeros(grid.volume_shape, np.float32)
    ref = np.asarray(
        KP.integrate_views_oriented(vol, grid, views, PARAMS, mode="rowsel")
    )
    for wr_, nk_ in ((8, 1), (16, 1), (32, 4)):
        got = np.asarray(
            KP.integrate_views_oriented(
                vol, grid, views, PARAMS, mode="rowsel",
                window_rows=wr_, rowsel_passes=nk_,
            )
        )
        np.testing.assert_array_equal(got, ref)


def test_rowsel_matches_oracle():
    views = sphere_scene(n_views=4, width=144, height=64, focal=60.0)
    grid = small_grid()
    vol = np.zeros(grid.volume_shape, np.float32)
    got = np.asarray(
        KP.integrate_views_oriented(vol, grid, views, PARAMS, mode="rowsel")
    )
    exp = integrate_views_oracle(grid, views, PARAMS)
    err = np.abs(got - exp.astype(np.float32))
    assert (err > 1e-3).mean() == 0.0


def test_view_block_variants_are_identical():
    """vb=2/4 process multiple views per grid step with register
    accumulation; results must be bit-identical to vb=1."""
    views = sphere_scene(n_views=4, width=144, height=64, focal=60.0)
    grid = small_grid()
    vol = np.zeros(grid.volume_shape, np.float32)
    ref = np.asarray(
        KP.integrate_views_oriented(vol, grid, views, PARAMS, mode="rowsel")
    )
    for vb in (2, 4, 3):  # 3 does not divide the padded view count -> falls back
        got = np.asarray(
            KP.integrate_views_oriented(
                vol, grid, views, PARAMS, mode="rowsel", view_block=vb
            )
        )
        np.testing.assert_array_equal(got, ref)


def test_z_block_variants_are_identical():
    """kz=2/4 share one depth-block DMA across kz z-slices; per-voxel view
    accumulation order is unchanged, so results must be bit-identical to
    kz=1 in every mode (unlike vb, which reorders the accumulation)."""
    views = sphere_scene(n_views=4, width=144, height=64, focal=60.0)
    grid = small_grid()
    vol = np.zeros(grid.volume_shape, np.float32)
    for mode in ("rowsel", "rowsel3"):
        ref = np.asarray(
            KP.integrate_views_oriented(vol, grid, views, PARAMS, mode=mode)
        )
        for kz in (2, 4, 5):  # 5 won't divide cz -> clamped down
            got = np.asarray(
                KP.integrate_views_oriented(
                    vol, grid, views, PARAMS, mode=mode, z_block=kz
                )
            )
            np.testing.assert_array_equal(got, ref)


def test_split_depth_planes_reconstruct_exactly():
    """The 3-way bf16-valued split must reconstruct arbitrary fp32 depth
    maps bit-exactly (including the -1.0 invalid sentinel)."""
    rng = np.random.default_rng(7)
    d = (rng.standard_normal((3, 16, 128)).astype(np.float32) * 37.5).astype(
        np.float32
    )
    d[0, :4] = -1.0
    d[1, 2, 5] = np.float32(1e-30)  # tiny but normal
    planes = KP.split_depth_planes(d)
    assert planes.shape == (3, 3, 16, 128)
    recon = planes[:, 0] + planes[:, 1] + planes[:, 2]
    np.testing.assert_array_equal(recon, d)
    # Any accumulation order is exact (non-overlapping mantissa segments).
    recon2 = planes[:, 2] + planes[:, 1] + planes[:, 0]
    np.testing.assert_array_equal(recon2, d)


def test_rowsel3_matches_rowsel_exactly():
    """rowsel3 (DEFAULT-precision dots over exact split planes) must agree
    bit-for-bit with rowsel (HIGHEST-precision single-plane dot)."""
    views = sphere_scene(n_views=4, width=144, height=64, focal=60.0)
    grid = small_grid()
    vol = np.zeros(grid.volume_shape, np.float32)
    ref = np.asarray(
        KP.integrate_views_oriented(vol, grid, views, PARAMS, mode="rowsel")
    )
    for vb in (1, 2):
        got = np.asarray(
            KP.integrate_views_oriented(
                vol, grid, views, PARAMS, mode="rowsel3", view_block=vb
            )
        )
        np.testing.assert_array_equal(got, ref)


def test_rowsel3_degenerate_tunables_hit_remainder_walk():
    """The rowsel3 remainder walk reconstructs the fp32 window from the
    split planes; degenerate tunables must not change values."""
    views = sphere_scene(n_views=3, width=144, height=64, focal=60.0)
    grid = small_grid()
    vol = np.zeros(grid.volume_shape, np.float32)
    ref = np.asarray(
        KP.integrate_views_oriented(vol, grid, views, PARAMS, mode="rowsel3")
    )
    got = np.asarray(
        KP.integrate_views_oriented(
            vol, grid, views, PARAMS, mode="rowsel3",
            window_rows=8, rowsel_passes=1,
        )
    )
    np.testing.assert_array_equal(got, ref)


def test_rowsel3m_no_miss_matches_exact_bitwise():
    """Default tunables cover the whole sphere scene: the miss kernel must
    report zero misses and be bit-identical to the exact mode."""
    views = sphere_scene(n_views=4, width=144, height=64, focal=60.0)
    grid = small_grid()
    vol = np.zeros(grid.volume_shape, np.float32)
    plan = KP.OrientedFusionPlan(grid, views, PARAMS, subtile_rows=16)
    ref = np.asarray(plan.run(vol, mode="rowsel3"))
    got = np.asarray(plan.run(vol, mode="rowsel3m"))
    assert plan.last_miss == 0
    np.testing.assert_array_equal(got, ref)


def test_rowselm_miss_triggers_exact_redispatch():
    """Degenerate tunables (1-row window, 1 pass, 1 column window) force
    misses; the miss path must detect them and re-dispatch the exact
    kernel, yielding bit-identical results."""
    views = sphere_scene(n_views=3, width=144, height=64, focal=60.0)
    grid = small_grid()
    vol = np.zeros(grid.volume_shape, np.float32)
    kw = dict(window_rows=8, rowsel_passes=1, windows=(1, 1))
    plan = KP.OrientedFusionPlan(grid, views, PARAMS, subtile_rows=16)
    ref = np.asarray(plan.run(vol, mode="rowsel", **kw))
    for mode in ("rowselm", "rowsel3m"):
        got = np.asarray(plan.run(vol, mode=mode, **kw))
        assert plan.last_miss > 0, mode
        np.testing.assert_array_equal(got, ref)
    # The miss->exact runner-key surgery must survive extra key fields
    # (z_block sits between view_block and anchors in the key tuple).
    got = np.asarray(plan.run(vol, mode="rowsel3m", z_block=2, **kw))
    assert plan.last_miss > 0
    np.testing.assert_array_equal(got, ref)


def test_pallas_integrate_miss_fallback_single_call():
    """The low-level pallas_integrate API also re-dispatches on miss."""
    from cudadepthmapintegration_tpu.ops.integrate import projection_tables

    views = sphere_scene(n_views=2, width=144, height=64, focal=60.0)
    # cells = dims-1: (cz, cy, cx) = (16, 16, 128) — already kernel-aligned
    # (pallas_integrate, unlike the plan, takes pre-padded volumes).
    grid = small_grid(dims=(129, 17, 17))
    t = projection_tables(grid, views, np.float32)
    depths = np.stack([v.depth for v in views]).astype(np.float32)
    vol = np.zeros(grid.volume_shape, np.float32)
    kw = dict(subtile_rows=16, window_rows=8, rowsel_passes=1, windows=(1, 1))
    ref = np.asarray(KP.pallas_integrate(
        vol, t.tx, t.ty, t.tz, t.tc, depths,
        PARAMS.thick, PARAMS.rho, PARAMS.eta, PARAMS.delta,
        mode="rowsel", **kw,
    ))
    got = np.asarray(KP.pallas_integrate(
        vol, t.tx, t.ty, t.tz, t.tc, depths,
        PARAMS.thick, PARAMS.rho, PARAMS.eta, PARAMS.delta,
        mode="rowselm", **kw,
    ))
    np.testing.assert_array_equal(got, ref)


def test_endpoint_anchors_are_exact():
    """anchors='endpoint' replaces the per-row lane reductions with two
    static endpoint slices; anchors affect coverage/speed, never values."""
    views = sphere_scene(n_views=4, width=144, height=64, focal=60.0)
    grid = small_grid()
    vol = np.zeros(grid.volume_shape, np.float32)
    ref = np.asarray(
        KP.integrate_views_oriented(vol, grid, views, PARAMS, mode="rowsel3")
    )
    for mode in ("rowsel", "rowsel3"):
        got = np.asarray(
            KP.integrate_views_oriented(
                vol, grid, views, PARAMS, mode=mode, anchors="endpoint"
            )
        )
        np.testing.assert_array_equal(got, ref)
    # Degenerate tunables + endpoint anchors: everything still exact via
    # the remainder walk.
    got = np.asarray(
        KP.integrate_views_oriented(
            vol, grid, views, PARAMS, mode="rowsel3", anchors="endpoint",
            window_rows=8, rowsel_passes=1, windows=(1, 1),
        )
    )
    np.testing.assert_array_equal(got, ref)


def test_split_depth_planes_device_matches_host():
    """The jax-array split path must produce the same planes as the host
    numpy path (device pipelines split on-chip, e.g. capstone_1024)."""
    import jax.numpy as jnp

    rng = np.random.default_rng(5)
    d = (rng.standard_normal((2, 8, 128)) * 11.0).astype(np.float32)
    d[0, 0] = -1.0
    host = KP.split_depth_planes(d)
    dev = np.asarray(KP.split_depth_planes(jnp.asarray(d)))
    np.testing.assert_array_equal(host, dev)


def test_pallas_integrate_accepts_device_depths():
    """rowsel3 with jax-array depths (on-device pad + split) must match
    the numpy-staged path bit-for-bit."""
    import jax.numpy as jnp

    from cudadepthmapintegration_tpu.ops.integrate import projection_tables

    views = sphere_scene(n_views=2, width=144, height=64, focal=60.0)
    grid = small_grid(dims=(129, 17, 17))
    t = projection_tables(grid, views, np.float32)
    depths = np.stack([v.depth for v in views]).astype(np.float32)
    vol = np.zeros(grid.volume_shape, np.float32)
    args = (t.tx, t.ty, t.tz, t.tc)
    kw = dict(subtile_rows=16, mode="rowsel3")
    ref = np.asarray(KP.pallas_integrate(
        vol, *args, depths,
        PARAMS.thick, PARAMS.rho, PARAMS.eta, PARAMS.delta, **kw,
    ))
    got = np.asarray(KP.pallas_integrate(
        vol, *args, jnp.asarray(depths),
        PARAMS.thick, PARAMS.rho, PARAMS.eta, PARAMS.delta, **kw,
    ))
    np.testing.assert_array_equal(got, ref)


def test_depth_vmem_ceiling_guard():
    """Oversized maps raise the actionable host-side error (the measured
    Mosaic-allocator ceiling, docs/KERNEL.md) instead of an opaque
    remote-compile failure."""
    import pytest

    from cudadepthmapintegration_tpu.kernels.integrate_pallas import (
        _check_depth_vmem,
    )

    _check_depth_vmem(600, 800, 600, 896, split3=True)  # measured OK
    with pytest.raises(ValueError, match="VMEM"):
        _check_depth_vmem(768, 1024, 768, 1024, split3=True)  # measured fail
    # Single-plane rowsel admits ~3x larger maps.
    _check_depth_vmem(768, 1024, 768, 1024, split3=False)
    with pytest.raises(ValueError, match="VMEM"):
        _check_depth_vmem(1536, 2048, 1536, 2048, split3=False)


def test_vmem_safe_mode_downgrade():
    """Oversized maps are routed to a bit-identical mode instead of a
    Mosaic-allocator failure: 3-plane over / 1-plane fits -> single-plane
    VMEM mode; 1-plane over -> HBM-resident mode (round 3: no size
    ceiling at all). Diagnostics never switch residency silently."""
    import pytest

    from cudadepthmapintegration_tpu.kernels.integrate_pallas import (
        _vmem_safe_mode,
    )

    assert _vmem_safe_mode("rowsel3", 480, 640, 64) == "rowsel3"
    assert _vmem_safe_mode("rowsel3", 768, 1024, 64) == "rowsel"
    assert _vmem_safe_mode("rowsel3m", 768, 1024, 64) == "rowselm"
    assert _vmem_safe_mode("rowsel", 768, 1024, 64) == "rowsel"
    # Beyond the single-plane ceiling: HBM-resident band-sweep modes, no
    # error. Routing compares BAND COUNTS (fewer bands won at every cap2
    # probe point) and prefers the 3-plane sweep only on ties — at
    # 2000x1000 the single plane fits 1024-row bands (2 bands) while the
    # 3-plane budget clamps to 256 (8 bands), so rowselh wins there too.
    assert _vmem_safe_mode("rowsel3", 1536, 2048, 64) == "rowselh"
    assert _vmem_safe_mode("rowsel3", 2000, 1000, 64) == "rowselh"
    assert _vmem_safe_mode("rowsel", 1536, 2048, 64) == "rowselh"
    assert _vmem_safe_mode("rowsel3h", 480, 640, 64) == "rowsel3h"
    assert _vmem_safe_mode("rowselh", 1536, 2048, 64) == "rowselh"
    with pytest.raises(ValueError, match="VMEM"):
        _vmem_safe_mode("rowsel3m", 1536, 2048, 64)
    with pytest.raises(ValueError, match="VMEM"):
        _vmem_safe_mode("rowselm", 1536, 2048, 64)


def test_pallas_integrate_dyn_fallback_functional_entry():
    """The functional entry (pallas_integrate) owns its own dyn-mode
    fallback recursion (re-pads the ORIGINAL depths for the band-sweep);
    force misses with a tiny budget and pin bit-identity to rowsel."""
    from cudadepthmapintegration_tpu.kernels.integrate_pallas import (
        pallas_integrate,
    )
    from cudadepthmapintegration_tpu.ops.integrate import projection_tables

    views = sphere_scene(n_views=3, width=144, height=64, focal=60.0)
    grid = small_grid()
    t = projection_tables(grid, views, np.float32)
    depths = np.stack([v.depth for v in views]).astype(np.float32)
    tx = KP._pad_table_invalid(t.tx, 128)  # cx padded to the lane width
    vol = np.zeros((16, 16, 128), np.float32)  # pre-padded (cy 16, cx 128)
    kw = dict(thick=PARAMS.thick, rho=PARAMS.rho, eta=PARAMS.eta,
              delta=PARAMS.delta, window_rows=16, rowsel_passes=2)
    ref = np.asarray(pallas_integrate(
        vol, tx, t.ty, t.tz, t.tc, depths, mode="rowsel", **kw,
    ))
    old = KP.DEPTH_VMEM_BUDGET
    KP.DEPTH_VMEM_BUDGET = 4 * 8 * 256 * 4  # bv=8: tiny 2-band window
    try:
        got = np.asarray(pallas_integrate(
            vol, tx, t.ty, t.tz, t.tc, depths, mode="rowseld", **kw,
        ))
    finally:
        KP.DEPTH_VMEM_BUDGET = old
    np.testing.assert_array_equal(got, ref)


def test_hbm_modes_match_vmem_modes_exactly():
    """'rowselh'/'rowsel3h' (HBM-resident depth planes, per-footprint DMA)
    must be bit-identical to the whole-map VMEM modes — residency affects
    speed and capacity, never values."""
    views = sphere_scene(n_views=3, width=144, height=64, focal=60.0)
    grid = small_grid()
    vol = np.zeros(grid.volume_shape, np.float32)
    ref = np.asarray(
        KP.integrate_views_oriented(vol, grid, views, PARAMS, mode="rowsel")
    )
    for mode in ("rowselh", "rowsel3h"):
        got = np.asarray(
            KP.integrate_views_oriented(vol, grid, views, PARAMS, mode=mode)
        )
        np.testing.assert_array_equal(got, ref)


def test_hbm_mode_degenerate_tunables_hit_remainder_dma_walk():
    """window_rows=8 / rowsel_passes=1 push most voxels through the HBM
    remainder walk (per-window DMA); results must be identical."""
    views = sphere_scene(n_views=3, width=144, height=64, focal=60.0)
    grid = small_grid()
    vol = np.zeros(grid.volume_shape, np.float32)
    ref = np.asarray(
        KP.integrate_views_oriented(vol, grid, views, PARAMS, mode="rowsel")
    )
    for wr_, nk_ in ((8, 1), (32, 4)):
        got = np.asarray(
            KP.integrate_views_oriented(
                vol, grid, views, PARAMS, mode="rowsel3h",
                window_rows=wr_, rowsel_passes=nk_,
            )
        )
        np.testing.assert_array_equal(got, ref)


def test_hbm_mode_inside_out_rig_matches():
    """Cameras INSIDE the grid looking out (the RGB-D walkthrough case)
    put the camera plane through the volume — projected pixels for
    near-pole voxels land anywhere in the image, the case a
    footprint-window design cannot bound. The band-sweep reaches the
    whole map band by band, so results must still be bit-identical to
    the whole-map VMEM mode."""
    from cudadepthmapintegration_tpu.testing import (
        look_at_camera,
        render_sphere_view,
    )

    W, H = 144, 64
    cams = [
        look_at_camera((0.2, 0.0, 0.1), (2.0, 0.3, 0.0), focal=40.0,
                       width=W, height=H),
        look_at_camera((-0.1, 0.2, 0.0), (-2.0, 0.0, 0.4), focal=40.0,
                       width=W, height=H),
    ]
    views = [render_sphere_view(c, W, H, radius=1.0, background=-1.0)
             for c in cams]
    grid = small_grid()
    vol = np.zeros(grid.volume_shape, np.float32)
    ref = np.asarray(
        KP.integrate_views_oriented(vol, grid, views, PARAMS, mode="rowsel")
    )
    for mode in ("rowselh", "rowsel3h"):
        got = np.asarray(
            KP.integrate_views_oriented(vol, grid, views, PARAMS, mode=mode)
        )
        np.testing.assert_array_equal(got, ref)


def test_dyn_band_mode_matches_whole_map():
    """Dynamic 2-band modes ('rowseld'/'rowsel3d'): orbit rigs are
    boundable (h2>0 at block corners), so the fast path serves every
    pair (miss == 0) and the result is bit-identical to the whole-map
    mode."""
    from cudadepthmapintegration_tpu.kernels.integrate_pallas import (
        OrientedFusionPlan,
    )

    views = sphere_scene(n_views=3, width=144, height=64, focal=60.0)
    grid = small_grid()
    vol = np.zeros(grid.volume_shape, np.float32)
    plan = OrientedFusionPlan(grid, views, PARAMS)
    ref = np.asarray(plan.run(vol, mode="rowsel"))
    for mode in ("rowseld", "rowsel3d"):
        got = np.asarray(plan.run(vol, mode=mode))
        np.testing.assert_array_equal(got, ref)
        assert plan.last_miss == 0, f"{mode} unexpectedly missed"


def test_dyn_band_mode_pole_falls_back_exactly():
    """Cameras inside the grid defeat the corner bound (pole blocks) —
    the dyn fast path counts misses and run() re-dispatches the exact
    band-sweep mode; the result must still be bit-identical."""
    from cudadepthmapintegration_tpu.kernels.integrate_pallas import (
        OrientedFusionPlan,
    )
    from cudadepthmapintegration_tpu.testing import (
        look_at_camera,
        render_sphere_view,
    )

    W, H = 144, 64
    cams = [
        look_at_camera((0.2, 0.0, 0.1), (2.0, 0.3, 0.0), focal=40.0,
                       width=W, height=H),
        look_at_camera((-0.1, 0.2, 0.0), (-2.0, 0.0, 0.4), focal=40.0,
                       width=W, height=H),
    ]
    views = [render_sphere_view(c, W, H, radius=1.0, background=-1.0)
             for c in cams]
    grid = small_grid()
    vol = np.zeros(grid.volume_shape, np.float32)
    plan = OrientedFusionPlan(grid, views, PARAMS)
    ref = np.asarray(plan.run(vol, mode="rowsel"))
    # Default 256-row bands swallow a 64-row test map whole (2 bands
    # cover everything -> no miss); shrink the budget so bands are 8
    # rows and the pole footprints genuinely escape the 2-band window.
    old = KP.DEPTH_VMEM_BUDGET
    KP.DEPTH_VMEM_BUDGET = 4 * 8 * 256 * 4
    try:
        got = np.asarray(plan.run(vol, mode="rowseld"))
    finally:
        KP.DEPTH_VMEM_BUDGET = old
    np.testing.assert_array_equal(got, ref)
    assert plan.last_miss > 0, "pole rig should exercise the fallback"


def test_windowed_band_mode_matches_whole_map():
    """Windowed band-sweep ('rowselw'/'rowsel3w'): on an orbit rig the
    host corner-bound windows cover every pair (miss == 0) and the result
    is bit-identical to the whole-map mode. Budget shrunk so bands are 8
    rows — the windows genuinely skip bands (multi-band regime)."""
    from cudadepthmapintegration_tpu.kernels.integrate_pallas import (
        OrientedFusionPlan,
    )

    views = sphere_scene(n_views=3, width=144, height=64, focal=60.0)
    grid = small_grid()
    vol = np.zeros(grid.volume_shape, np.float32)
    plan = OrientedFusionPlan(grid, views, PARAMS)
    ref = np.asarray(plan.run(vol, mode="rowsel"))
    old = KP.DEPTH_VMEM_BUDGET
    KP.DEPTH_VMEM_BUDGET = 2 * 8 * 256 * 4
    try:
        for mode in ("rowselw", "rowsel3w"):
            got = np.asarray(plan.run(vol, mode=mode))
            np.testing.assert_array_equal(got, ref)
            assert plan.last_miss == 0, f"{mode} unexpectedly missed"
    finally:
        KP.DEPTH_VMEM_BUDGET = old


def test_windowed_band_mode_inside_out_rig_matches():
    """Cameras inside the grid (mixed-sign corner h2) defeat the corner
    bound — such units get the FULL map as their window, so the windowed
    sweep degrades to the plain sweep without losing exactness."""
    from cudadepthmapintegration_tpu.kernels.integrate_pallas import (
        OrientedFusionPlan,
    )
    from cudadepthmapintegration_tpu.testing import (
        look_at_camera,
        render_sphere_view,
    )

    W, H = 144, 64
    cams = [
        look_at_camera((0.2, 0.0, 0.1), (2.0, 0.3, 0.0), focal=40.0,
                       width=W, height=H),
        look_at_camera((-0.1, 0.2, 0.0), (-2.0, 0.0, 0.4), focal=40.0,
                       width=W, height=H),
    ]
    views = [render_sphere_view(c, W, H, radius=1.0, background=-1.0)
             for c in cams]
    grid = small_grid()
    vol = np.zeros(grid.volume_shape, np.float32)
    plan = OrientedFusionPlan(grid, views, PARAMS)
    ref = np.asarray(plan.run(vol, mode="rowsel"))
    old = KP.DEPTH_VMEM_BUDGET
    KP.DEPTH_VMEM_BUDGET = 2 * 8 * 256 * 4
    try:
        for mode in ("rowselw", "rowsel3w"):
            got = np.asarray(plan.run(vol, mode=mode))
            np.testing.assert_array_equal(got, ref)
            assert plan.last_miss == 0, (
                f"{mode}: full-map windows must serve every pair"
            )
    finally:
        KP.DEPTH_VMEM_BUDGET = old


def test_windowed_band_lying_anchor_falls_back_exactly(monkeypatch):
    """If a window bound were ever violated, the in-kernel out-of-window
    counter must trigger the exact band-sweep re-dispatch. Force it by
    monkeypatching the host planner to claim a 1-band window anchored at
    band 0 for every unit."""
    from cudadepthmapintegration_tpu.kernels.integrate_pallas import (
        OrientedFusionPlan,
    )

    views = sphere_scene(n_views=3, width=144, height=64, focal=60.0)
    grid = small_grid()
    vol = np.zeros(grid.volume_shape, np.float32)
    plan = OrientedFusionPlan(grid, views, PARAMS)
    ref = np.asarray(plan.run(vol, mode="rowsel"))

    real = KP._window_band_bounds_host

    def lying(*args, **kw):
        an, _ = real(*args, **kw)
        return np.zeros_like(an), 1

    monkeypatch.setattr(KP, "_window_band_bounds_host", lying)
    old = KP.DEPTH_VMEM_BUDGET
    KP.DEPTH_VMEM_BUDGET = 2 * 8 * 256 * 4
    try:
        got = np.asarray(plan.run(vol, mode="rowselw"))
    finally:
        KP.DEPTH_VMEM_BUDGET = old
    np.testing.assert_array_equal(got, ref)
    assert plan.last_miss > 0, "lying window should exercise the fallback"


def test_pallas_integrate_windowed_functional_entry():
    """The functional entry owns its own windowed-mode planning + fallback;
    also pin the under-jit behavior (tracers -> plain band sweep)."""
    import jax

    from cudadepthmapintegration_tpu.kernels.integrate_pallas import (
        pallas_integrate,
    )
    from cudadepthmapintegration_tpu.ops.integrate import projection_tables

    views = sphere_scene(n_views=3, width=144, height=64, focal=60.0)
    grid = small_grid()
    t = projection_tables(grid, views, np.float32)
    depths = np.stack([v.depth for v in views]).astype(np.float32)
    tx = KP._pad_table_invalid(t.tx, 128)  # cx padded to the lane width
    vol = np.zeros((16, 16, 128), np.float32)  # pre-padded (cy 16, cx 128)
    kw = dict(thick=PARAMS.thick, rho=PARAMS.rho, eta=PARAMS.eta,
              delta=PARAMS.delta, window_rows=16, rowsel_passes=2)
    ref = np.asarray(pallas_integrate(
        vol, tx, t.ty, t.tz, t.tc, depths, mode="rowsel", **kw,
    ))
    old = KP.DEPTH_VMEM_BUDGET
    KP.DEPTH_VMEM_BUDGET = 2 * 8 * 256 * 4
    try:
        got = np.asarray(pallas_integrate(
            vol, tx, t.ty, t.tz, t.tc, depths, mode="rowselw", **kw,
        ))
        np.testing.assert_array_equal(got, ref)
        traced = jax.jit(
            lambda v, d: pallas_integrate(
                v, tx, t.ty, t.tz, t.tc, d, mode="rowselw", **kw
            )
        )(vol, depths)
        np.testing.assert_array_equal(np.asarray(traced), ref)
    finally:
        KP.DEPTH_VMEM_BUDGET = old


def test_auto_rowsel_passes_bit_identical_and_per_group():
    """rowsel_passes='auto' must (a) be bit-identical to fixed counts and
    (b) actually choose DIFFERENT counts per orientation group on a mixed
    rig (axis-aligned groups need fewer passes than oblique ones)."""
    from cudadepthmapintegration_tpu.kernels.integrate_pallas import (
        OrientedFusionPlan,
    )
    from cudadepthmapintegration_tpu.testing import (
        orbit_cameras,
        render_sphere_view,
    )

    W, H = 144, 64
    cams = list(orbit_cameras(3, 3.5, focal=60.0, width=W, image_height=H))
    cams += list(orbit_cameras(3, 0.5, height=4.0, focal=60.0,
                               width=W, image_height=H))
    views = [render_sphere_view(c, W, H, radius=1.0, background=-1.0)
             for c in cams]
    grid = small_grid()
    vol = np.zeros(grid.volume_shape, np.float32)
    plan = OrientedFusionPlan(grid, views, PARAMS)
    ref = np.asarray(plan.run(vol, mode="rowsel", rowsel_passes=2))
    got = np.asarray(plan.run(vol, mode="rowsel", rowsel_passes="auto"))
    np.testing.assert_array_equal(got, ref)
    assert plan.group_passes, "auto run must expose chosen counts"
    assert all(2 <= k <= 12 for k in plan.group_passes)


def test_auto_passes_differ_on_mixed_rig_512_geometry():
    """At bench-like geometry the estimator separates top-down from orbit
    groups (pins the per-group property without TPU hardware)."""
    from cudadepthmapintegration_tpu.core import VoxelGrid
    from cudadepthmapintegration_tpu.kernels.integrate_pallas import (
        OrientedFusionPlan,
    )
    from cudadepthmapintegration_tpu.testing import (
        orbit_cameras,
        render_sphere_view,
    )

    dims, w, h = 513, 512, 512
    grid = VoxelGrid(dims=(dims,) * 3, origin=(-1.6,) * 3,
                     spacing=(3.2 / (dims - 1),) * 3)
    cams = list(orbit_cameras(8, 4.0, focal=300.0, width=w, image_height=h))
    cams += list(orbit_cameras(8, 0.5, height=4.0, focal=300.0,
                               width=w, image_height=h))
    views = [render_sphere_view(c, w, h, radius=1.0, background=-1.0)
             for c in cams]
    plan = OrientedFusionPlan(grid, views, PARAMS, subtile_rows=64)
    ks = plan._group_passes("auto", 64)
    assert min(ks) <= 3, f"axis-aligned groups should need few passes: {ks}"
    assert max(ks) >= 5, f"oblique orbit groups should need more: {ks}"


def test_per_group_redispatch_bit_identical():
    """per_group_redispatch must equal the exact mode bitwise, re-running
    only the groups that actually missed (degenerate tunables force misses
    in oblique groups; axis-aligned top-down groups cover statically)."""
    from cudadepthmapintegration_tpu.kernels.integrate_pallas import (
        OrientedFusionPlan,
    )
    from cudadepthmapintegration_tpu.testing import (
        orbit_cameras,
        render_sphere_view,
    )

    W, H = 144, 64
    cams = list(orbit_cameras(3, 3.5, focal=60.0, width=W, image_height=H))
    cams += list(orbit_cameras(3, 0.5, height=4.0, focal=60.0,
                               width=W, image_height=H))
    views = [render_sphere_view(c, W, H, radius=1.0, background=-1.0)
             for c in cams]
    grid = small_grid()
    vol = np.zeros(grid.volume_shape, np.float32)
    plan = OrientedFusionPlan(grid, views, PARAMS)
    kw = dict(window_rows=16, rowsel_passes=1)  # force some misses
    ref = np.asarray(plan.run(vol, mode="rowsel3", **kw))
    got = np.asarray(
        plan.run(vol, mode="rowsel3m", per_group_redispatch=True, **kw)
    )
    np.testing.assert_array_equal(got, ref)
    assert len(plan.last_group_miss) == len(plan.groups)
    assert plan.last_miss == sum(plan.last_group_miss)
    assert plan.last_miss > 0, "tunables should have forced misses"


def test_fast_groups_auto_bit_identical():
    """fast_groups='auto' routes statically-covered groups (straight-down
    scan) through the tracked no-remainder kernel with exact fallback;
    results must be bit-identical to the inline kernel."""
    from cudadepthmapintegration_tpu.kernels.integrate_pallas import (
        OrientedFusionPlan,
    )
    from cudadepthmapintegration_tpu.testing import (
        look_at_camera,
        orbit_cameras,
        render_sphere_view,
    )

    W, H = 144, 64
    # Mixed: a straight-down scan segment (statically covered) + oblique
    # orbit views (needs the remainder walk).
    cams = [
        look_at_camera((x, y, 4.0), (x, y, 0.0), focal=60.0,
                       width=W, height=H)
        for x in (-0.4, 0.4) for y in (-0.4, 0.4)
    ]
    cams += list(orbit_cameras(3, 3.5, focal=60.0, width=W, image_height=H))
    views = [render_sphere_view(c, W, H, radius=1.0, background=-1.0)
             for c in cams]
    grid = small_grid()
    vol = np.zeros(grid.volume_shape, np.float32)
    plan = OrientedFusionPlan(grid, views, PARAMS)
    covered = plan._statically_covered_groups("auto", 32, min_samples=100)
    assert covered, "scan group should be statically covered"
    ref = np.asarray(
        plan.run(vol, mode="rowsel3", rowsel_passes="auto", window_rows=32)
    )
    got = np.asarray(
        plan.run(vol, mode="rowsel3", rowsel_passes="auto", window_rows=32,
                 fast_groups="auto")
    )
    np.testing.assert_array_equal(got, ref)
    assert any(m == 0 for m in plan.last_group_miss)  # fast path engaged
    assert any(m == -1 for m in plan.last_group_miss)  # inline groups too


def test_fast_groups_not_viable_on_oversized_maps():
    """The tracked twin keeps the whole-map VMEM residency requirement, so
    fast_groups must be skipped (not crash with the diagnostic's hard
    VMEM error) whenever _vmem_safe_mode would downgrade or HBM-route the
    exact mode — regression for the production default path
    (mode='rowsel3', fast_groups='auto') with HD depth maps."""
    from cudadepthmapintegration_tpu.kernels.integrate_pallas import (
        _fast_groups_viable,
    )

    assert _fast_groups_viable("rowsel3", 480, 640, 64)
    assert _fast_groups_viable("rowsel", 480, 640, 64)
    # 3-plane ceiling exceeded -> downgrade -> tracked twin would differ.
    assert not _fast_groups_viable("rowsel3", 768, 1024, 64)
    # Single-plane ceiling exceeded -> HBM route -> tracked twin RAISES.
    assert not _fast_groups_viable("rowsel3", 1080, 1920, 64)
    assert not _fast_groups_viable("rowsel", 1536, 2048, 64)


def test_wide_u_span_group_not_statically_covered():
    """A group whose subtiles project WIDER in u than the kernel's
    128*n_wc column window must not be classified statically covered: the
    kernel counts out-of-window pairs as remainder work, so the sampler
    has to as well (they were previously dropped from the statistics,
    making wide-u scans masquerade as zero-miss fast-path candidates)."""
    from cudadepthmapintegration_tpu.kernels.integrate_pallas import (
        OrientedFusionPlan,
    )
    from cudadepthmapintegration_tpu.testing import (
        look_at_camera,
        render_sphere_view,
    )

    W, H = 1024, 64
    # Straight-down mapping scan (one orientation group, zero tilt) with a
    # long focal: ~60 px per voxel in u, so 16 voxel columns span ~960 px
    # >> the 256 px (n_wc=2) window.
    cams = [
        look_at_camera((x, y, 4.0), (x, y, 0.0), focal=1200.0,
                       width=W, height=H)
        for x in (-0.2, 0.2) for y in (-0.2, 0.2)
    ]
    views = [render_sphere_view(c, W, H, radius=1.0, background=-1.0)
             for c in cams]
    plan = OrientedFusionPlan(small_grid(), views, PARAMS)
    covered = plan._statically_covered_groups("auto", 32, min_samples=100)
    assert covered == [], (
        "wide-u group must stay on the inline kernel, got %r" % covered
    )
    n_valid, span, vloc = plan._span_stats(0, 32, 2)[:3]
    assert n_valid >= 100 and (vloc >= 32).any(), (
        "sampler should see out-of-window pairs as unservable"
    )


def test_skip_dead_variants_bit_identical_and_auto_routes():
    """The dead-unit-skipping kernel variant must be bit-identical to the
    unpredicated kernel (skipping a unit with no valid pixel only removes
    a += 0.0), and skip_dead='auto' must route per group: a close-up rig
    (most of the grid outside the frustum) clears SKIP_DEAD_FRAC, a
    grid-filling orbit does not."""
    from cudadepthmapintegration_tpu.kernels.integrate_pallas import (
        OrientedFusionPlan,
    )
    from cudadepthmapintegration_tpu.testing import (
        look_at_camera,
        render_sphere_view,
    )

    grid = small_grid()
    vol = np.zeros(grid.volume_shape, np.float32)

    # Close-up rig: narrow view of one grid corner -> most units dead.
    W, H = 144, 64
    cams = [look_at_camera((3.0, 1.2, 1.2), (1.5, 1.5, 1.5), focal=200.0,
                           width=W, height=H)]
    views = [render_sphere_view(c, W, H, radius=1.0, background=-1.0)
             for c in cams]
    plan = OrientedFusionPlan(grid, views, PARAMS)
    off = np.asarray(plan.run(vol, mode="rowsel3", skip_dead=False))
    on = np.asarray(plan.run(vol, mode="rowsel3", skip_dead=True))
    np.testing.assert_array_equal(on, off)
    auto = np.asarray(plan.run(vol, mode="rowsel3", skip_dead="auto"))
    np.testing.assert_array_equal(auto, off)
    assert any(plan.group_skip_dead), (
        f"close-up rig should route the skip variant "
        f"(got {plan.group_skip_dead})"
    )

    # Grid-filling orbit with UNPADDED groups (16 views -> two full
    # groups of 8): every view step live -> auto keeps the skip off.
    # (A 3-view scene pads its groups with dummy views, whose steps are
    # 100% dead — the effective-deadness rule routes those True, which
    # the view-count probe measured as a +25.7% win at 50% padding.)
    views2 = sphere_scene(n_views=16, width=144, height=64, focal=60.0)
    plan2 = OrientedFusionPlan(grid, views2, PARAMS)
    ref = np.asarray(plan2.run(vol, mode="rowsel", skip_dead=False))
    got = np.asarray(plan2.run(vol, mode="rowsel", skip_dead="auto"))
    np.testing.assert_array_equal(got, ref)
    assert not any(plan2.group_skip_dead), (
        f"unpadded live orbit should keep the unpredicated kernel "
        f"(got {plan2.group_skip_dead})"
    )

    # Padded tiny rig: dummy-view steps dominate -> auto routes the skip.
    views3 = sphere_scene(n_views=3, width=144, height=64, focal=60.0)
    plan3 = OrientedFusionPlan(grid, views3, PARAMS)
    ref3 = np.asarray(plan3.run(vol, mode="rowsel", skip_dead=False))
    got3 = np.asarray(plan3.run(vol, mode="rowsel", skip_dead="auto"))
    np.testing.assert_array_equal(got3, ref3)
    assert any(plan3.group_skip_dead), (
        f"view-padded groups should route the skip "
        f"(got {plan3.group_skip_dead})"
    )


def test_transpose_maps_exact():
    """transpose_maps serves depth maps transposed (u/v table rows swapped,
    arrays transposed). The transform itself is exact: the XLA integrator
    is BIT-identical under it (pinned below). The Pallas plan changes the
    chosen axis permutation with it, which regroups the layout-order
    separable sum — the documented ±1-ulp relabeling effect (docs/PARITY.md
    round-3 section) — so the kernel gates at ulp tolerance vs the
    untransposed plan and at the standard tolerance vs the fp64 oracle."""
    from cudadepthmapintegration_tpu.ops.integrate import (
        _integrate_batched,
        projection_tables,
    )
    from cudadepthmapintegration_tpu.testing import look_at_camera, render_sphere_view

    import jax.numpy as jnp

    grid = VoxelGrid(dims=(17, 17, 17), origin=(-1.63, -1.61, -1.59),
                     spacing=(0.2, 0.2, 0.2))
    vol = np.zeros(grid.volume_shape, np.float32)

    rng = np.random.default_rng(5)
    same = []
    for _ in range(4):
        eye = (float(rng.uniform(-0.4, 0.4)), -4.0, float(rng.uniform(-0.4, 0.4)))
        cam = look_at_camera(eye, (0, 0, 0), focal=55.0, width=144, height=64)
        same.append(render_sphere_view(cam, 144, 64))

    # 1) The transform is exact: XLA integrator, same association order on
    # both sides -> bit-identical.
    t = projection_tables(grid, same, np.float32)
    depths = np.stack([v.depth for v in same]).astype(np.float32)
    sw = np.array([1, 0, 2, 3])
    kw = dict(view_batch=4, thick=PARAMS.thick, rho=PARAMS.rho,
              eta=PARAMS.eta, delta=PARAMS.delta)
    xa = np.asarray(_integrate_batched(
        jnp.zeros(grid.volume_shape, jnp.float32),
        *[jnp.asarray(x) for x in (t.tx, t.ty, t.tz, t.tc)],
        jnp.asarray(depths), h=64, w=144, **kw,
    ))
    xb = np.asarray(_integrate_batched(
        jnp.zeros(grid.volume_shape, jnp.float32),
        *[jnp.asarray(x[:, sw]) for x in (t.tx, t.ty, t.tz, t.tc)],
        jnp.asarray(np.ascontiguousarray(depths.transpose(0, 2, 1))),
        h=144, w=64, **kw,
    ))
    np.testing.assert_array_equal(xb, xa)

    # 2) Pallas plan: perm changes with the transpose -> ±ulp regrouping
    # of the separable sum; values agree to fp32 regrouping tolerance.
    a = np.asarray(KP.OrientedFusionPlan(grid, same, PARAMS).run(vol))
    b = np.asarray(
        KP.OrientedFusionPlan(grid, same, PARAMS, transpose_maps=True).run(vol)
    )
    np.testing.assert_allclose(b, a, atol=2e-5, rtol=0)
    assert (b != a).mean() < 0.05  # regrouping touches isolated ramp voxels

    # 3) Standard oracle gate on a mixed orbit.
    views = sphere_scene(n_views=6, width=144, height=64, focal=60.0)
    got = np.asarray(
        KP.OrientedFusionPlan(grid, views, PARAMS, transpose_maps=True).run(vol)
    )
    exp = integrate_views_oracle(grid, views, PARAMS)
    assert (np.abs(got - exp.astype(np.float32)) > 1e-3).mean() == 0.0
