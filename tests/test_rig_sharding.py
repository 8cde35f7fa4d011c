"""Rig-aware shard-axis selection (parallel/rig.py).

The permuted-grid path must be EXACTLY the original fusion in a different
memory layout — these tests pin bit-identity, not tolerance parity.
"""

import numpy as np
import pytest

from cudadepthmapintegration_tpu.core import RayPotential, VoxelGrid
from cudadepthmapintegration_tpu.ops.integrate import TSDFIntegrator
from cudadepthmapintegration_tpu.parallel import (
    ShardedTSDFIntegrator,
    best_shard_grid_axis,
    grid_for_sharding,
    make_mesh,
    permute_grid_axes,
    unpermute_volume,
)
from cudadepthmapintegration_tpu.testing import orbit_cameras, render_sphere_view

PARAMS = RayPotential(thick=0.1, rho=0.8, eta=0.03, delta=0.3)
W, H = 64, 48


def _views(cams):
    return [render_sphere_view(c, W, H, radius=1.0, background=-1.0)
            for c in cams]


def _grid(dims=(17, 13, 9)):
    return VoxelGrid(dims=dims, origin=(-1.6, -1.6, -1.6),
                     spacing=tuple(3.2 / (d - 1) for d in dims))


def test_best_axis_equatorial_is_z():
    views = _views(orbit_cameras(6, 4.0, focal=60.0, width=W, image_height=H))
    assert best_shard_grid_axis(_grid(), views) == 2


def test_best_axis_topdown_is_in_plane():
    views = _views(orbit_cameras(6, 0.5, height=4.0, focal=60.0,
                                 width=W, image_height=H))
    assert best_shard_grid_axis(_grid(), views) in (0, 1)


def test_permuted_centers_exact():
    grid = _grid()
    perm = (1, 2, 0)
    pg = permute_grid_axes(grid, perm)
    # World position of permuted voxel (i', j', k') == original voxel with
    # old-axis indices scattered by perm — spot-check a few cells.
    rng = np.random.default_rng(0)
    cxp, cyp, czp = pg.cell_dims
    for _ in range(16):
        ip = rng.integers(cxp)
        jp = rng.integers(cyp)
        kp = rng.integers(czp)
        new_idx = (ip, jp, kp)  # grid-axis order x', y', z'
        old_idx = [0, 0, 0]
        for new_ax, old_ax in enumerate(perm):
            old_idx[old_ax] = new_idx[new_ax]
        for g, idx in ((pg, new_idx), (grid, old_idx)):
            c = g.origin + (np.asarray(idx, np.float64) + 0.5) * g.spacing
            w = (g.matrix @ np.append(c, 1.0))[:3]
            if g is pg:
                w_new = w
        assert np.array_equal(w_new, w)


@pytest.mark.parametrize("perm", [(1, 0, 2), (2, 1, 0), (1, 2, 0)])
def test_permuted_fusion_bit_identical(perm):
    grid = _grid()
    views = _views(orbit_cameras(5, 3.5, focal=60.0, width=W, image_height=H))
    base = TSDFIntegrator(grid, PARAMS, dtype=np.float64) \
        .reset().integrate(views).result()
    pg = permute_grid_axes(grid, perm)
    pv = TSDFIntegrator(pg, PARAMS, dtype=np.float64) \
        .reset().integrate(views).result()
    assert np.array_equal(unpermute_volume(pv, perm), base)


def test_permute_unpermute_roundtrip():
    vol = np.arange(2 * 3 * 4, dtype=np.float64).reshape(2, 3, 4)
    from cudadepthmapintegration_tpu.parallel import permute_volume
    for perm in [(1, 0, 2), (2, 1, 0), (1, 2, 0), (2, 0, 1)]:
        assert np.array_equal(
            unpermute_volume(permute_volume(vol, perm), perm), vol
        )


def test_pipeline_shard_axis_auto_topdown():
    # End-to-end: sharded pipeline with shard_axis='auto' on a top-down rig
    # returns the canonical-layout volume, matching the plain pipeline.
    from cudadepthmapintegration_tpu.pipeline import (
        ReconstructionConfig,
        ReconstructionPipeline,
    )

    cfg = ReconstructionConfig(
        grid_dims=(17, 17, 17),
        grid_spacing=(0.2, 0.2, 0.2),
        grid_origin=(-1.6, -1.6, -1.6),
        ray_thick=0.1, ray_rho=0.8, ray_eta=0.03, ray_delta=0.3,
        contour_value=1.0, dtype="float64", write_mha_path=None,
    )
    views = _views(orbit_cameras(4, 0.5, height=4.0, focal=60.0,
                                 width=W, image_height=H))
    base = ReconstructionPipeline(cfg).run(views)
    auto = ReconstructionPipeline(
        cfg, mesh=make_mesh(), shard_axis="auto"
    ).run(views)
    np.testing.assert_allclose(auto.volume, base.volume, rtol=0, atol=0)
    assert auto.volume.shape == base.volume.shape


def test_grid_for_sharding_topdown_sharded_matches():
    # Top-down rig: grid_for_sharding must move an in-plane axis to z and
    # the SHARDED fusion on the permuted grid must reproduce the canonical
    # result exactly after unpermutation.
    grid = _grid(dims=(17, 17, 17))  # 16^3 cells: divisible over the mesh
    views = _views(orbit_cameras(4, 0.5, height=4.0, focal=60.0,
                                 width=W, image_height=H))
    pg, perm = grid_for_sharding(grid, views)
    assert perm != (0, 1, 2)

    base = TSDFIntegrator(grid, PARAMS, dtype=np.float64) \
        .reset().integrate(views).result()
    mesh = make_mesh()
    sharded = ShardedTSDFIntegrator(pg, PARAMS, mesh, dtype=np.float64) \
        .reset().integrate(views).result()
    np.testing.assert_allclose(
        unpermute_volume(sharded, perm), base, rtol=0, atol=0
    )


def test_grid_for_sharding_skips_non_divisible_axis():
    # Top-down rig wants an in-plane axis on z, but x/y cells (16) don't
    # divide an hypothetical 7-way mesh while z cells (14) do: 'auto' must
    # fall back to an axis that actually shards rather than raising later.
    grid = _grid(dims=(17, 17, 15))  # cells (cx, cy, cz) = (16, 16, 14)
    views = _views(orbit_cameras(4, 0.5, height=4.0, focal=60.0,
                                 width=W, image_height=H))
    pg, perm = grid_for_sharding(grid, views, n_shards=7)
    assert perm == (0, 1, 2) and pg is grid  # only z divides 7
    # With a divisor every axis satisfies, the rig choice is honored.
    pg2, perm2 = grid_for_sharding(grid, views, n_shards=2)
    assert perm2 != (0, 1, 2)
    # No axis divisible: identity (caller fails as explicit 'z' would).
    pg3, perm3 = grid_for_sharding(grid, views, n_shards=5)
    assert perm3 == (0, 1, 2)


def test_rig_cameras_avoids_frame_decode():
    # Sequences with a cameras() method must not be indexed per frame.
    from cudadepthmapintegration_tpu.parallel.rig import rig_cameras

    views = _views(orbit_cameras(4, 4.0, focal=60.0, width=W,
                                 image_height=H))

    class Ds:
        def __len__(self):
            return len(views)

        def __getitem__(self, i):
            raise AssertionError("frame decoded for camera access")

        def cameras(self):
            return [v.camera for v in views]

    cams = rig_cameras(Ds())
    assert len(cams) == 4
    # Plain long sequences are stride-sampled, not fully decoded.
    touched = []

    class Seq:
        def __len__(self):
            return 4096

        def __getitem__(self, i):
            touched.append(i)
            return views[i % len(views)]

    assert len(rig_cameras(Seq())) <= 64
    assert len(touched) <= 64


def test_pipeline_auto_axis_composes_with_checkpoint(tmp_path):
    # shard_axis='auto' + --checkpoint: checkpoints live in the CANONICAL
    # layout, the permuted integrator is seeded across the boundary, and a
    # crashed canonical run RESUMES under an auto-axis pipeline.
    from cudadepthmapintegration_tpu.pipeline import (
        ReconstructionConfig,
        ReconstructionPipeline,
    )
    from cudadepthmapintegration_tpu.pipeline.runner import (
        FaultTolerantRunner,
        FusionUnitError,
    )

    cfg = ReconstructionConfig(
        grid_dims=(17, 17, 17),
        grid_spacing=(0.2, 0.2, 0.2),
        # Offset origin (like config17 in the pipeline tests): relabeling
        # regroups the fp64 hom sum, so projections landing EXACTLY on a
        # half-pixel boundary may round differently across layouts — see
        # the "knife-edge" note in parallel/rig.py.
        grid_origin=(-1.63, -1.61, -1.59),
        ray_thick=0.1, ray_rho=0.8, ray_eta=0.03, ray_delta=0.3,
        contour_value=1.0, dtype="float64", write_mha_path=None,
        stream_batch=2,
        checkpoint_path=str(tmp_path / "auto.ckpt"),
    )
    # Top-down rig: 'auto' picks a non-z axis (pinned by the tests above).
    views = _views(orbit_cameras(8, 0.5, height=4.0, focal=60.0,
                                 width=W, image_height=H))
    grid = cfg.make_grid()
    params = cfg.ray_potential()

    # Crash a CANONICAL-layout run after one unit (unit_size == stream_batch
    # so the pipeline's resumed runner sees the same unit layout).
    calls = {"n": 0}

    def crashy(volume, batch):
        calls["n"] += 1
        if calls["n"] > 1:
            raise RuntimeError("host died")
        integ = TSDFIntegrator(grid, params, dtype=np.float64).reset(volume)
        integ.integrate(batch, cfg.threshold_best_cost)
        return integ.result()

    r1 = FaultTolerantRunner(
        grid, params, crashy, unit_size=2, max_retries=1,
        checkpoint_path=cfg.checkpoint_path,
    )
    with pytest.raises(FusionUnitError):
        r1.run(views)
    assert len(r1.completed_units) == 1

    # Resume under the sharded auto-axis pipeline; must match the plain run
    # (tolerance: per-unit fusion regroups the fp64 accumulation vs the
    # plain path's single batched scan — semantic differences would be
    # O(rho)=0.8, not 1e-12). Poisoning the COMPLETED unit's views proves
    # the resume actually skipped it (re-fusing them would corrupt the
    # volume by a whole view contribution).
    base_cfg = ReconstructionConfig(**{
        **{f.name: getattr(cfg, f.name)
           for f in __import__("dataclasses").fields(cfg)},
        "checkpoint_path": None,
    })
    base = ReconstructionPipeline(base_cfg).run(views)
    resumed_views = [views[4], views[5]] + views[2:]
    auto = ReconstructionPipeline(
        cfg, mesh=make_mesh(), shard_axis="auto"
    ).run(resumed_views)
    np.testing.assert_allclose(auto.volume, base.volume, rtol=0, atol=1e-12)
    assert auto.views_fused == 8
