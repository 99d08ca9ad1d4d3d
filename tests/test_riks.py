"""Riks arc-length continuation (solvers/riks.py).

The flagship target is the one reference fixture NO load-controlled solver
converges: cook_membrane/largeDef_quadEl (6.25 MPa on the E=70 Saint-Venant
material).  Arc-length control walks through the fold and turns the round-1
"presumed instability" into measured evidence: a limit point near
lambda ~ 0.65 where the tangent loses positive definiteness, followed by a
snap-through branch with decreasing load.
"""

import numpy as np
import pytest

from femcy_tpu import FEMesh, FEMSystem, SolverConfig, read_inp
from femcy_tpu.materials import material_from_inp
from femcy_tpu.solvers.riks import riks_solve

BEAM_LARGE = "beam_deflection/load800_freeEnd_largeDef/beamDeflec_quadPSE_largeD_load800.inp"
COOK_625 = "cook_membrane/largeDef_quadEl/cook_membrane_2d.inp"


def _system(fixtures_dir, rel):
    inp = read_inp(fixtures_dir / rel)
    mat = material_from_inp(inp.material_type, inp.material_params, inp.element_type)
    mesh = FEMesh(inp.nodes, inp.elements, inp.element)
    return inp, FEMSystem(mesh, mat, True, SolverConfig(tangent="consistent"))


def test_riks_matches_newton_on_stable_path(fixtures_dir):
    """On a fold-free problem the arc-length path lands on the same
    equilibrium as plain load control."""
    inp, newton_sys = _system(fixtures_dir, BEAM_LARGE)
    assert newton_sys.solve(inp).success
    d_ref = float(np.abs(np.asarray(newton_sys.dof)).max())

    _, riks_sys = _system(fixtures_dir, BEAM_LARGE)
    report = riks_solve(riks_sys, inp, lam_target=1.0, first_dlam=0.15)
    assert report.success
    assert not report.limit_point
    d = float(np.abs(np.asarray(riks_sys.dof)).max())
    assert abs(d - d_ref) / d_ref < 1e-3


def test_riks_finds_cook_625_limit_point(fixtures_dir):
    """The 6.25 MPa Cook has a fold the load-controlled solvers stall at
    (PARITY.md).  Riks must (a) detect it via the stiffness-parameter sign
    change, (b) traverse it (load DECREASES along the path afterwards), and
    (c) the tangent at the fold must have lost positive definiteness
    (the det-K diagnostic, checked by Cholesky failure)."""
    import jax.numpy as jnp
    import scipy.linalg

    inp, system = _system(fixtures_dir, COOK_625)
    report = riks_solve(
        system, inp, lam_target=1.0, first_dlam=0.2, max_steps=26
    )
    assert report.limit_point, "no limit point detected"
    assert 0.4 < report.lam_max < 0.95
    assert report.u_limit is not None
    lam = report.lam_history
    peak = int(np.argmax(lam))
    assert peak < len(lam) - 1, "path ended at the peak, no traversal"
    assert min(lam[peak:]) < report.lam_max, (
        "load did not decrease after the fold (no snap-through branch)"
    )

    # det-sign evidence: K is SPD well below the fold, not SPD at/past it
    from femcy_tpu import bc as bc_mod

    patterns, tractions = bc_mod.build_neumann_patterns(
        system.mesh, inp.neumann_bcs
    )
    q = jnp.asarray(np.einsum("b,bn->n", tractions, patterns))
    fixed, sval = bc_mod.build_dirichlet_arrays(
        inp.dirichlet_bcs, system.mesh, 1.0, 1.0, None
    )

    def K_dense_at(u, lam_val):
        _, values, _, _, _ = system._jit_newton_eval(
            system._arrs, jnp.asarray(u), lam_val * q,
            jnp.asarray(fixed), jnp.asarray(sval),
        )
        pat = system.dia if system.dia is not None else system.pattern
        return pat.to_scipy(np.asarray(values)).toarray()

    # stable state: re-solve the low-load equilibrium with plain Newton
    low = FEMSystem(system.mesh, system.material, True,
                    SolverConfig(tangent="consistent"))
    inp_low = read_inp(fixtures_dir / COOK_625)
    inp_low.neumann_bcs[0].traction *= 0.3
    assert low.solve(inp_low).success
    K_low = K_dense_at(np.asarray(low.dof), 0.3)
    scipy.linalg.cholesky(K_low)  # must succeed: SPD below the fold

    # fold state: q . K^-1 q < 0 there, so the tangent must be indefinite
    K_fold = K_dense_at(report.u_limit, report.lam_limit)
    with pytest.raises(scipy.linalg.LinAlgError):
        scipy.linalg.cholesky(K_fold)
