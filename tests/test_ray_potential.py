"""Golden-value tests of the ray-potential profile, derived by hand from the
closed-form piecewise definition in Reconstruction/CudaReconstruction.cu:104-120."""

import jax.numpy as jnp
import numpy as np
import pytest

from cudadepthmapintegration_tpu.core.ray_potential import (
    RayPotential,
    ray_potential_jnp,
    ray_potential_np,
)

P = RayPotential(thick=0.1, rho=0.8, eta=0.03, delta=0.3)


# (real_distance - depth, expected) pairs covering every branch & boundary.
GOLDEN = [
    # |diff| > delta, diff > 0  -> 0  (voxel far behind surface)
    (0.5, 0.0),
    # |diff| > delta, diff < 0  -> -eta*rho  (far in front: empty-space vote)
    (-0.5, -0.03 * 0.8),
    # delta >= |diff| > thick   -> rho * sign(diff)
    (0.2, 0.8),
    (-0.2, -0.8),
    (0.3, 0.8),     # |diff| == delta is NOT > delta -> shell branch
    (-0.3, -0.8),
    # |diff| <= thick           -> (rho/thick) * diff
    (0.05, 8.0 * 0.05),
    (-0.05, -8.0 * 0.05),
    (0.1, 8.0 * 0.1),   # |diff| == thick -> ramp branch (rho at the edge)
    (0.0, 0.0),
]


@pytest.mark.parametrize("diff,expected", GOLDEN)
def test_golden_numpy(diff, expected):
    got = ray_potential_np(np.array(diff), np.array(0.0), P)
    assert got == pytest.approx(expected, abs=1e-15)


@pytest.mark.parametrize("diff,expected", GOLDEN)
def test_golden_jnp(diff, expected):
    got = ray_potential_jnp(
        jnp.float64(diff), jnp.float64(0.0), P.thick, P.rho, P.eta, P.delta
    )
    assert float(got) == pytest.approx(expected, abs=1e-12)


def test_numpy_jnp_agree_randomly():
    rng = np.random.default_rng(0)
    real = rng.uniform(-2, 2, size=1000)
    depth = rng.uniform(-2, 2, size=1000)
    a = ray_potential_np(real, depth, P)
    b = np.asarray(
        ray_potential_jnp(
            jnp.asarray(real), jnp.asarray(depth), P.thick, P.rho, P.eta, P.delta
        )
    )
    np.testing.assert_allclose(a, b, atol=1e-12)


def test_validation_rules():
    # delta must be >= thick, eta within [0, 1] (Reconstruction/main.cxx:270-276)
    with pytest.raises(ValueError):
        RayPotential(thick=2.0, delta=0.3).validate()
    with pytest.raises(ValueError):
        RayPotential(thick=0.1, delta=0.3, eta=1.5).validate()
    RayPotential(thick=0.1, delta=0.3, eta=0.5).validate()
