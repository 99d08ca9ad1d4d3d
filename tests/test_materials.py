"""Constitutive-model tests: closed-form C, stress/energy sanity, parity of
small/large kinematics in the small-strain limit."""

import jax.numpy as jnp
import numpy as np
import pytest

from femcy_tpu.materials import (
    LinearIsotropic,
    LinearIsotropicPlaneStrain,
    LinearIsotropicPlaneStress,
    NeoHookean,
)

MATERIALS = [
    LinearIsotropic(modulus=210e3, poisson_ratio=0.3),
    LinearIsotropicPlaneStress(modulus=210e3, poisson_ratio=0.3),
    LinearIsotropicPlaneStrain(modulus=210e3, poisson_ratio=0.3),
    NeoHookean(C1=0.4, D1=0.05),
]


@pytest.mark.parametrize("mat", MATERIALS, ids=lambda m: type(m).__name__)
def test_zero_stress_at_identity(mat):
    F = jnp.eye(mat.dm)
    np.testing.assert_allclose(np.asarray(mat.cauchy_small(F)), 0.0, atol=1e-9)
    np.testing.assert_allclose(np.asarray(mat.cauchy_large(F)), 0.0, atol=1e-9)
    np.testing.assert_allclose(float(mat.energy_density(F)), 0.0, atol=1e-12)


@pytest.mark.parametrize("mat", MATERIALS, ids=lambda m: type(m).__name__)
def test_small_equals_large_in_small_strain_limit(mat):
    rng = np.random.default_rng(1)
    eps = 1e-7 * rng.standard_normal((mat.dm, mat.dm))
    F = jnp.eye(mat.dm) + jnp.asarray(eps)
    s_small = np.asarray(mat.cauchy_small(F))
    s_large = np.asarray(mat.cauchy_large(F))
    scale = max(np.abs(s_small).max(), 1e-30)
    np.testing.assert_allclose(s_large / scale, s_small / scale, atol=1e-5)


def test_linear_isotropic_uniaxial():
    E, nu = 200.0, 0.25
    mat = LinearIsotropic(modulus=E, poisson_ratio=nu)
    # uniaxial strain e00 = a: sigma00 = C00*a, sigma11 = sigma22 = C01*a
    a = 1e-4
    F = jnp.eye(3).at[0, 0].add(a)
    s = np.asarray(mat.cauchy_small(F))
    c00 = E * (1 - nu) / (1 + nu) / (1 - 2 * nu)
    c01 = E * nu / (1 + nu) / (1 - 2 * nu)
    np.testing.assert_allclose(s[0, 0], c00 * a, rtol=1e-10)
    np.testing.assert_allclose(s[1, 1], c01 * a, rtol=1e-10)
    np.testing.assert_allclose(s[2, 2], c01 * a, rtol=1e-10)
    assert abs(s[0, 1]) < 1e-12


def test_plane_stress_uniaxial_gives_zero_transverse_stress_ratio():
    # pure uniaxial *stress* state: strain e11 = -nu * e00 makes sigma11 = 0
    E, nu = 100.0, 0.3
    mat = LinearIsotropicPlaneStress(modulus=E, poisson_ratio=nu)
    a = 1e-4
    F = jnp.eye(2).at[0, 0].add(a).at[1, 1].add(-nu * a)
    s = np.asarray(mat.cauchy_small(F))
    np.testing.assert_allclose(s[0, 0], E * a, rtol=1e-8)
    np.testing.assert_allclose(s[1, 1], 0.0, atol=1e-10)


def test_plane_strain_nearly_incompressible_finite():
    mat = LinearIsotropicPlaneStrain(modulus=100.0, poisson_ratio=0.4999)
    assert np.isfinite(mat.C).all()
    F = jnp.eye(2).at[0, 0].add(1e-4)
    assert np.isfinite(np.asarray(mat.cauchy_small(F))).all()


def test_neo_hookean_energy_and_stress_consistency():
    """sigma = J^-1 dpsi/dF F^T must match the closed form (autodiff check)."""
    import jax

    mat = NeoHookean(C1=0.4, D1=0.05)
    rng = np.random.default_rng(2)
    F = jnp.eye(3) + 0.1 * jnp.asarray(rng.standard_normal((3, 3)))
    P = jax.grad(mat.energy_density)(F)  # first Piola-Kirchhoff
    from femcy_tpu.linalg import det_small

    sigma_ad = P @ F.T / det_small(F)
    sigma = mat.cauchy_large(F)
    np.testing.assert_allclose(np.asarray(sigma_ad), np.asarray(sigma), rtol=1e-9)


def test_neo_hookean_tangent_matches_reference_form():
    mat = NeoHookean(C1=0.4, D1=0.05)
    C = mat.C
    expected = 4 * 0.4 * np.eye(6)
    expected[:3, :3] += 2 * 0.05
    np.testing.assert_allclose(C, expected)


def test_material_from_inp_dispatch():
    from femcy_tpu.materials import material_from_inp

    m = material_from_inp("Elastic", [210e3, 0.3], "CPS6")
    assert isinstance(m, LinearIsotropicPlaneStress)
    m = material_from_inp("Elastic", [210e3, 0.3], "CPE4")
    assert isinstance(m, LinearIsotropicPlaneStrain)
    m = material_from_inp("Elastic", [210e3, 0.3], "C3D4")
    assert isinstance(m, LinearIsotropic)
    m = material_from_inp("Hyperelastic, neo hooke", [0.4, 0.05], "C3D10")
    assert isinstance(m, NeoHookean)
    np.testing.assert_allclose(m.D1, 20.0)  # D1 = 1/0.05 (ref: inp_info.py:311)
