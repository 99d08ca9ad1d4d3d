"""Mesh-convergence and dense-mesh end-to-end checks (SURVEY §4 fixtures)."""

import numpy as np
import pytest

from femcy_tpu import FEMesh, FEMSystem, SolverConfig, read_inp
from femcy_tpu.materials import material_from_inp


def _solve(fixtures_dir, rel, config=SolverConfig()):
    inp = read_inp(fixtures_dir / rel)
    mat = material_from_inp(inp.material_type, inp.material_params, inp.element_type)
    mesh = FEMesh(inp.nodes, inp.elements, inp.element)
    system = FEMSystem(mesh, mat, inp.geometric_nonlinear, config)
    report = system.solve(inp)
    assert report.success
    return inp, system


def test_beam_mesh_convergence(fixtures_dir):
    """Elastic energy must converge as the CPS6 mesh is refined (these are
    displacement-driven cases -- tip disp is prescribed at 20 -- so energy is
    the convergence observable; the reference README Fig. 2d uses this sweep).
    """
    energies = []
    for size in (8, 4, 2):  # coarse -> fine
        _, system = _solve(
            fixtures_dir, f"beam_deflection/meshSize/beam_CPS6_disp_meshSize{size}.inp"
        )
        assert float(np.abs(np.asarray(system.dof)).max()) == pytest.approx(20.0)
        energies.append(system.elastic_energy())
    d_coarse = abs(energies[1] - energies[0])
    d_fine = abs(energies[2] - energies[1])
    assert d_fine < d_coarse  # refinement differences shrink
    assert abs(energies[0] - energies[-1]) / energies[-1] < 0.05


def test_elliptic_dense_cps3(fixtures_dir):
    """3.7k-node dense mesh: sigma_yy at D converges to the CoFEA target."""
    import jax.numpy as jnp

    inp, system = _solve(
        fixtures_dir, "elliptic_membrane/very_dense/ellip_dense_CPS3_0d04.inp"
    )
    _, stress, _ = system.compute_strain_stress()
    syy = np.asarray(stress)[:, :, 1, 1]
    nodal = np.asarray(system.extrapolate(jnp.asarray(syy)))
    d = int(np.argmin(((inp.nodes - [2.0, 0.0]) ** 2).sum(axis=1)))
    vals = [
        float(nodal[e, list(inp.elements[e]).index(d)])
        for e in range(len(inp.elements))
        if d in inp.elements[e]
    ]
    syy_d = max(vals)
    # single-GP CPS3 elements slightly under-predict on the very dense mesh
    assert abs(syy_d - 92.7) / 92.7 < 0.02


def test_cook_3d_small_def_linear(fixtures_dir):
    _, system = _solve(
        fixtures_dir, "cook_membrane/3D/smallDef_linerEl_coarse/cook_3d_linearEl_smallDef.inp"
    )
    d = float(np.abs(np.asarray(system.dof)).max())
    assert 20.0 < d < 40.0  # Cook tip deflection ballpark for this coarse mesh


def test_user_dirichlet_custom_callback(fixtures_dir):
    """A user-supplied Dirichlet subroutine must drive the solve."""
    inp = read_inp(fixtures_dir / "twist/twist_C3D10_coarse.inp")
    mat = material_from_inp(inp.material_type, inp.material_params, inp.element_type)
    mesh = FEMesh(inp.nodes, inp.elements, inp.element)
    system = FEMSystem(mesh, mat, inp.geometric_nonlinear)

    calls = []

    def user_fn(nodes, dof_dim, time):
        calls.append((len(nodes), dof_dim, time))
        # small axial stretch instead of the default rotation
        return np.full(nodes.shape[0], 0.01 * time)

    # run only the first increment by shrinking max_time
    inp.time_incs = dict(inp.time_incs, max_time=inp.time_incs["ini_inc"])
    report = system.solve(inp, user_dirichlet=user_fn)
    assert report.success
    assert calls  # the callback was used
    assert float(np.abs(np.asarray(system.dof)).max()) > 0
