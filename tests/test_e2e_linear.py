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
    # CoFEA target 92.7; the patch value at node D is 92.889
    assert abs(syy_d - 92.7) / 92.7 < 0.01
    # max patch-extrapolated sigma_yy (the reference workflow's reported
    # number: max over all patches, main.py:38-47) hits the published Abaqus
    # anchor 93.45 to <=0.1%; see test_cps3_independent_numpy_oracle for why
    # the reference's own 93.56 is not reproducible from this fixture
    _, stress, mises = system.compute_strain_stress()
    syy = np.asarray(stress)[:, :, 1, 1]
    nodal_max = float(np.asarray(system.extrapolate(jnp.asarray(syy))).max())
    assert abs(nodal_max - 93.45) / 93.45 < 0.001


def test_elliptic_cps6_sigma_yy(fixtures_dir):
    inp, system = _solve(fixtures_dir, ELLIP_CPS6)
    syy_d = _sigma_yy_at(inp, system, (2.0, 0.0))
    # <=0.1% of the reference-published values (README.md:70): FEMcy 93.32
    # nodal-extrapolated at D (we get 93.3125, 0.008% off), and the Abaqus
    # 93.34 stays within 0.05%
    assert abs(syy_d - 93.32) / 93.32 < 0.001
    assert abs(syy_d - 93.34) / 93.34 < 0.0005
    # at the integration point: FEMcy 84.40 (we get 84.3960, 0.005% off)
    _, stress, _ = system.compute_strain_stress()
    syy_gp = np.asarray(stress)[:, :, 1, 1].max()
    assert abs(syy_gp - 84.40) / 84.40 < 0.001


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


def test_cps3_independent_numpy_oracle(fixtures_dir):
    """Pin the framework to an INDEPENDENT plain-numpy CPS3 implementation.

    Reconciles the point-D anchor (VERDICT round 1): the exact FE solution of
    the shipped localVeryFine fixture has max patch sigma_yy = 93.451 --
    matching the reference's published *Abaqus* value 93.45 (README.md:69) to
    0.002% -- while the patch value AT node D=(2,0) is 92.889.  The
    reference's own published 93.56 (README.md:70) is 0.12% off the exact
    solution of this fixture and is not reproducible from it by exact linear
    algebra (direct solve == 1e-10 CG, test_cg_matches_direct), so 93.45 is
    the correct anchor for this mesh.
    """
    inp = read_inp(fixtures_dir / ELLIP_CPS3)
    E_mod, nu = inp.material_params[:2]
    C = (E_mod / (1 - nu**2)) * np.array(
        [[1.0, nu, 0.0], [nu, 1.0, 0.0], [0.0, 0.0, (1 - nu) / 2]]
    )
    nodes, elements = inp.nodes, inp.elements
    n_dof = inp.n_dof
    K = np.zeros((n_dof, n_dof))
    B_all = np.zeros((len(elements), 3, 6))
    for e, conn in enumerate(elements):
        x = nodes[conn]  # (3, 2)
        J = np.stack([x[1] - x[0], x[2] - x[0]])  # (2, 2)
        area = 0.5 * np.linalg.det(J)
        assert area > 0
        # constant B of the linear triangle: dN/dx from the inverse Jacobian
        dN_nat = np.array([[-1.0, -1.0], [1.0, 0.0], [0.0, 1.0]])
        dN = dN_nat @ np.linalg.inv(J).T  # (3, 2)
        B = np.zeros((3, 6))
        B[0, 0::2] = dN[:, 0]
        B[1, 1::2] = dN[:, 1]
        B[2, 0::2] = dN[:, 1]
        B[2, 1::2] = dN[:, 0]
        B_all[e] = B
        Ke = area * B.T @ C @ B
        idx = np.stack([2 * conn, 2 * conn + 1], axis=1).reshape(-1)
        K[np.ix_(idx, idx)] += Ke

    # Neumann: 1-GP edge quadrature, outward normal away from the third node
    from femcy_tpu import FEMesh as _FEMesh

    mesh = _FEMesh(nodes, elements, inp.element)
    rhs = np.zeros(n_dof)
    for bc in inp.neumann_bcs:
        for facet in bc.face_set:
            ele = mesh.boundary[tuple(facet)]
            a, b = facet
            edge = nodes[b] - nodes[a]
            L = np.linalg.norm(edge)
            n = np.array([edge[1], -edge[0]]) / L
            opp = [v for v in elements[ele] if v not in facet][0]
            mid = (nodes[a] + nodes[b]) / 2
            if np.dot(n, nodes[opp] - mid) > 0:
                n = -n
            for g in (a, b):
                rhs[2 * g : 2 * g + 2] += bc.traction * n * L / 2

    fixed = np.zeros(n_dof, dtype=bool)
    for bc in inp.dirichlet_bcs:
        assert bc.value == 0.0
        fixed[2 * bc.node_set + bc.dof] = True
    K[fixed, :] = 0.0
    K[:, fixed] = 0.0
    K[fixed, fixed] = 1.0
    rhs[fixed] = 0.0
    u = np.linalg.solve(K, rhs)

    syy = np.array(
        [(C @ B_all[e] @ u[np.stack([2 * c, 2 * c + 1], axis=1).reshape(-1)])[1]
         for e, c in enumerate(elements)]
    )
    # oracle reproduces the published Abaqus anchor on this fixture
    assert abs(syy.max() - 93.45) / 93.45 < 0.001

    # and the framework agrees with the oracle to solver precision
    _, system = _solve(fixtures_dir, ELLIP_CPS3)
    _, stress, _ = system.compute_strain_stress()
    syy_fw = np.asarray(stress)[:, :, 1, 1][:, 0]
    np.testing.assert_allclose(syy_fw, syy, rtol=1e-8, atol=1e-8)
