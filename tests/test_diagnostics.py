"""Failure diagnostics (config.diagnose_failure).

The reference aborts a non-converging analysis with a bare message
(stiffnessMtrx.py:698-701).  Here the abort path classifies WHY: element
inversion at the failed trial configuration, or loss of positive
definiteness of the constrained tangent at the last converged state (a
limit/bifurcation point, where cutting dt is futile).
"""

import numpy as np
import pytest

from femcy_tpu import FEMesh, FEMSystem, SolverConfig, read_inp
from femcy_tpu.elements import TET4
from femcy_tpu.materials import LinearIsotropic, material_from_inp

COOK_625 = "cook_membrane/largeDef_quadEl/cook_membrane_2d.inp"
BEAM_LARGE = (
    "beam_deflection/load800_freeEnd_largeDef/"
    "beamDeflec_quadPSE_largeD_load800.inp"
)


def _single_tet_system():
    nodes = np.array(
        [[0.0, 0.0, 0.0], [1.0, 0.0, 0.0], [0.0, 1.0, 0.0], [0.0, 0.0, 1.0]]
    )
    elements = np.array([[0, 1, 2, 3]], dtype=np.int32)
    mesh = FEMesh(nodes, elements, TET4)
    return FEMSystem(mesh, LinearIsotropic(1.0e3, 0.3), True, SolverConfig())


def test_min_element_volume_detects_inversion():
    system = _single_tet_system()
    assert system.min_element_volume() > 0.0
    # push the apex node through the base plane: det(J) flips sign
    dof = np.zeros(12)
    dof[11] = -2.0  # node 3 z-displacement: z = 1 -> -1
    assert system.min_element_volume(dof) < 0.0


def test_tangent_min_eigenvalue_spd_at_stable_state():
    system = _single_tet_system()
    fixed = np.zeros(12, dtype=bool)
    fixed[:9] = True  # clamp the base triangle, free apex
    sval = np.zeros(12)
    lam = system.tangent_min_eigenvalue(fixed, sval)
    assert lam is not None and lam > 0.0


def test_tangent_min_eigenvalue_requires_bc_state():
    system = _single_tet_system()
    with pytest.raises(ValueError):
        system.tangent_min_eigenvalue()


def test_abort_message_reports_element_inversion(fixtures_dir):
    """The 6.25 MPa Cook fold: the one-shot full-load Newton trial inverts
    elements; the abort message must say so instead of the bare reference
    text."""
    inp = read_inp(fixtures_dir / COOK_625)
    inp.time_incs = dict(inp.time_incs, ini_inc=1.0, min_inc=0.3)
    mat = material_from_inp(
        inp.material_type, inp.material_params, inp.element_type
    )
    system = FEMSystem(
        FEMesh(inp.nodes, inp.elements, inp.element),
        mat,
        True,
        SolverConfig(tangent="consistent"),
    )
    report = system.solve(inp)
    assert not report.success
    assert "element inversion at the trial configuration" in report.message


def test_diagnose_failure_opt_out(fixtures_dir):
    inp = read_inp(fixtures_dir / COOK_625)
    inp.time_incs = dict(inp.time_incs, ini_inc=1.0, min_inc=0.3)
    mat = material_from_inp(
        inp.material_type, inp.material_params, inp.element_type
    )
    system = FEMSystem(
        FEMesh(inp.nodes, inp.elements, inp.element),
        mat,
        True,
        SolverConfig(tangent="consistent", diagnose_failure=False),
    )
    report = system.solve(inp)
    assert not report.success
    assert report.message == (
        "allowable minimum dt reached; Newton's method did not converge"
    )


def test_tangent_eig_after_converged_solve(fixtures_dir):
    """After a successful nonlinear solve the stored Dirichlet state feeds
    the public probe; the converged beam state is stable (lambda_min > 0)."""
    inp = read_inp(fixtures_dir / BEAM_LARGE)
    mat = material_from_inp(
        inp.material_type, inp.material_params, inp.element_type
    )
    system = FEMSystem(
        FEMesh(inp.nodes, inp.elements, inp.element),
        mat,
        True,
        SolverConfig(tangent="consistent"),
    )
    report = system.solve(inp)
    assert report.success
    lam = system.tangent_min_eigenvalue()
    assert lam is not None and lam > 0.0
