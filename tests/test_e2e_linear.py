"""End-to-end linear (small-deformation) benchmarks vs published values.

Anchors (BASELINE.md / README.md:46-71 of the reference):
  elliptic membrane sigma_yy at point D (2.0, 0.0):
    CoFEA target 92.7 MPa; Abaqus 93.45 (CPS3 mesh) / 93.34 (CPS6 nodal);
    FEMcy 93.56 / 93.32.
"""

import jax.numpy as jnp
import numpy as np
import pytest

from femcy_tpu import FEMesh, FEMSystem, SolverConfig, read_inp
from femcy_tpu.materials import material_from_inp

ELLIP_CPS3 = "elliptic_membrane/element_linear/ellip_membrane_linEle_localVeryFine.inp"
ELLIP_CPS6 = "elliptic_membrane/element_quadratic/ellip_membrane_quadritic_trig_neumann.inp"
ELLIP_CPS4 = "elliptic_membrane/element_quadrilateral/ellip_CPS4.inp"
ELLIP_CPS8 = "elliptic_membrane/element_quadrilateral/ellip_CPS8.inp"


def _solve(fixtures_dir, rel, config=SolverConfig()):
    inp = read_inp(fixtures_dir / rel)
    mat = material_from_inp(inp.material_type, inp.material_params, inp.element_type)
    mesh = FEMesh(inp.nodes, inp.elements, inp.element)
    system = FEMSystem(mesh, mat, inp.geometric_nonlinear, config)
    report = system.solve(inp)
    assert report.success
    return inp, system


def _sigma_yy_at(inp, system, point):
    nodes = inp.nodes
    d = int(np.argmin(((nodes - np.asarray(point)) ** 2).sum(axis=1)))
    np.testing.assert_allclose(nodes[d], point, atol=1e-6)
    _, stress, _ = system.compute_strain_stress()
    syy = np.asarray(stress)[:, :, 1, 1]
    nodal = np.asarray(system.extrapolate(jnp.asarray(syy)))
    vals = [
        float(nodal[e, list(inp.elements[e]).index(d)])
        for e in range(len(inp.elements))
        if d in inp.elements[e]
    ]
    return max(vals)


def test_elliptic_cps3_sigma_yy(fixtures_dir):
    inp, system = _solve(fixtures_dir, ELLIP_CPS3)
    syy_d = _sigma_yy_at(inp, system, (2.0, 0.0))
    # CoFEA target 92.7; FEMcy publishes 93.56 on this mesh (README.md:70)
    assert abs(syy_d - 92.7) / 92.7 < 0.01
    # max nodal extrapolated sigma_yy matches the Abaqus value 93.45 closely
    _, stress, mises = system.compute_strain_stress()
    syy = np.asarray(stress)[:, :, 1, 1]
    nodal_max = float(np.asarray(system.extrapolate(jnp.asarray(syy))).max())
    assert abs(nodal_max - 93.45) / 93.45 < 0.005


def test_elliptic_cps6_sigma_yy(fixtures_dir):
    inp, system = _solve(fixtures_dir, ELLIP_CPS6)
    syy_d = _sigma_yy_at(inp, system, (2.0, 0.0))
    # FEMcy 93.32 / Abaqus 93.34 nodal-extrapolated (README.md:69-70)
    assert abs(syy_d - 93.33) / 93.33 < 0.005
    # at the integration point: FEMcy 84.40 / Abaqus 84.42
    _, stress, _ = system.compute_strain_stress()
    syy_gp = np.asarray(stress)[:, :, 1, 1].max()
    assert abs(syy_gp - 84.41) / 84.41 < 0.005


@pytest.mark.parametrize("rel", [ELLIP_CPS4, ELLIP_CPS8], ids=["cps4", "cps8"])
def test_elliptic_quads_run_and_are_sane(rel, fixtures_dir):
    inp, system = _solve(fixtures_dir, rel)
    syy_d = _sigma_yy_at(inp, system, (2.0, 0.0))
    # coarser quad meshes: within a few percent of the 92.7 target
    assert abs(syy_d - 92.7) / 92.7 < 0.06


def test_cg_matches_direct_on_elliptic(fixtures_dir):
    """The device PCG and the host direct solver must agree."""
    inp, system_direct = _solve(
        fixtures_dir, ELLIP_CPS3, SolverConfig(linear_solver="direct")
    )
    _, system_cg = _solve(
        fixtures_dir, ELLIP_CPS3, SolverConfig(linear_solver="cg", cg_eps=1e-10)
    )
    dof_d = np.asarray(system_direct.dof)
    dof_c = np.asarray(system_cg.dof)
    scale = np.abs(dof_d).max()
    np.testing.assert_allclose(dof_c / scale, dof_d / scale, atol=1e-7)


def test_elastic_energy_positive(fixtures_dir):
    _, system = _solve(fixtures_dir, ELLIP_CPS3)
    en = system.elastic_energy()
    assert en > 0
    # external work of a linear system = 2 * elastic energy; sanity bound
    assert en < 1.0


def test_elliptic_directional_traction(fixtures_dir):
    """Directional (non-pressure) *Dsload variant parses and solves sanely."""
    inp, system = _solve(
        fixtures_dir,
        "elliptic_membrane/directional_force/ellip_localVeryFine_directional_force.inp",
    )
    assert any(b.direction is not None for b in inp.neumann_bcs)
    _, stress, mises = system.compute_strain_stress()
    m = float(np.abs(np.asarray(mises)).max())
    assert 10.0 < m < 500.0


def test_elliptic_load_by_displacement(fixtures_dir):
    """Dirichlet-driven loading (nonzero prescribed values) over increments."""
    inp, system = _solve(
        fixtures_dir, "elliptic_membrane/load_by_disp/ellip_membrane_localFine_dirichlet.inp"
    )
    assert any(b.value != 0.0 for b in inp.dirichlet_bcs)
    dof = np.asarray(system.dof)
    # the final increment applies the full prescribed displacement
    prescribed = max(abs(b.value) for b in inp.dirichlet_bcs)
    np.testing.assert_allclose(np.abs(dof).max(), prescribed, rtol=1e-9)


def test_elliptic_3d_matches_2d_plane_stress(fixtures_dir):
    """The C3D4 3D elliptic model is a thin extrusion of the plane-stress
    case: its peak sigma_yy must land near the 2D result."""
    import jax.numpy as jnp

    inp, system = _solve(fixtures_dir, "elliptic_membrane/3D/linearEl/ellip_membrane_3d_linearEl.inp")
    _, stress, _ = system.compute_strain_stress()
    syy = np.asarray(stress)[:, :, 1, 1]
    nodal = np.asarray(system.extrapolate(jnp.asarray(syy)))
    # coarse 3D tet mesh: same order as the CoFEA 92.7 target
    assert 60.0 < nodal.max() < 120.0
