"""Multi-device tests on the 8-device virtual CPU mesh (conftest.py)."""

import importlib.util
import pathlib

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from femcy_tpu import FEMSystem, SolverConfig
from femcy_tpu.materials import LinearIsotropic, LinearIsotropicPlaneStress
from femcy_tpu.meshgen import box_tets, rect_tris
from femcy_tpu.parallel.sharded import ShardedLinearSolver
from femcy_tpu.solvers.direct import direct_solve


@pytest.fixture(scope="module")
def eight_devices():
    devs = jax.devices()
    if len(devs) < 8:
        pytest.skip("needs 8 virtual devices (see conftest XLA_FLAGS)")
    return devs[:8]


def _tension_problem(mesh):
    fixed = np.zeros(mesh.n_dof, dtype=bool)
    sval = np.zeros(mesh.n_dof)
    dm = mesh.dm
    left = np.nonzero(mesh.nodes[:, 0] < 1e-9)[0]
    right = np.nonzero(mesh.nodes[:, 0] > mesh.nodes[:, 0].max() - 1e-9)[0]
    for d in range(dm):
        fixed[left * dm + d] = True
    fixed[right * dm + 0] = True
    sval[right * dm + 0] = 0.05
    return fixed, sval, np.zeros(mesh.n_dof)


@pytest.mark.parametrize(
    "mesh,mat",
    [
        (box_tets(4, 4, 4), LinearIsotropic(100.0, 0.3)),
        (rect_tris(10, 7), LinearIsotropicPlaneStress(100.0, 0.3)),
    ],
    ids=["tet4-3d", "tri3-2d"],
)
def test_sharded_matches_direct(mesh, mat, eight_devices):
    fixed, sval, rhs = _tension_problem(mesh)
    solver = ShardedLinearSolver(mesh, mat, devices=eight_devices, cg_eps=1e-10)
    x, iters = solver.solve(rhs, fixed, sval)
    assert iters > 0

    system = FEMSystem(mesh, mat, False, SolverConfig(linear_solver="direct"))
    values, rhs_bc, _ = system._jit_linear_system(
        system._arrs, jnp.asarray(rhs), jnp.asarray(fixed), jnp.asarray(sval)
    )
    pat = system.dia if system.dia is not None else system.pattern
    x_ref = np.asarray(direct_solve(pat, values, rhs_bc))
    assert np.isfinite(x_ref).all()
    scale = np.abs(x_ref).max()
    np.testing.assert_allclose(
        np.asarray(x) / scale, x_ref / scale, atol=1e-8
    )


def test_sharded_padded_rows_are_inert(eight_devices):
    """n_dof not divisible by the device count with dof 0 FREE: the padded
    rows must not couple to column 0 (regression for the identity-row bug)."""
    mesh = box_tets(3, 3, 3)  # n_dof = 192, 5 devices -> 3 padded rows
    mat = LinearIsotropic(100.0, 0.3)
    fixed = np.zeros(mesh.n_dof, dtype=bool)
    sval = np.zeros(mesh.n_dof)
    right = np.nonzero(mesh.nodes[:, 0] > mesh.nodes[:, 0].max() - 1e-9)[0]
    for d in range(3):
        fixed[right * 3 + d] = True  # node 0 (x=0 corner) stays free
    sval[right * 3 + 0] = 0.05
    rhs = np.zeros(mesh.n_dof)

    solver = ShardedLinearSolver(mesh, mat, devices=eight_devices[:5], cg_eps=1e-10)
    x, _ = solver.solve(rhs, fixed, sval)

    system = FEMSystem(mesh, mat, False, SolverConfig(linear_solver="direct"))
    values, rhs_bc, _ = system._jit_linear_system(
        system._arrs, jnp.asarray(rhs), jnp.asarray(fixed), jnp.asarray(sval)
    )
    pat = system.dia if system.dia is not None else system.pattern
    x_ref = np.asarray(direct_solve(pat, values, rhs_bc))
    assert np.isfinite(x_ref).all()
    scale = np.abs(x_ref).max()
    np.testing.assert_allclose(np.asarray(x) / scale, x_ref / scale, atol=1e-7)


def test_sharded_device_counts(eight_devices):
    """Same answer on 1, 2, 4, 8 devices."""
    mesh = box_tets(3, 3, 3)
    mat = LinearIsotropic(100.0, 0.3)
    fixed, sval, rhs = _tension_problem(mesh)
    sols = []
    for n in (1, 2, 4, 8):
        solver = ShardedLinearSolver(
            mesh, mat, devices=eight_devices[:n], cg_eps=1e-10
        )
        x, _ = solver.solve(rhs, fixed, sval)
        sols.append(np.asarray(x))
    for s in sols[1:]:
        np.testing.assert_allclose(s, sols[0], atol=1e-8)


def test_graft_entry_contract(eight_devices):
    """The driver contract: entry() compiles single-chip; dryrun_multichip(8)
    compiles and executes the full sharded step."""
    path = pathlib.Path(__file__).resolve().parents[1] / "__graft_entry__.py"
    spec = importlib.util.spec_from_file_location("__graft_entry__", path)
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)

    fn, args = mod.entry()
    out = jax.jit(fn)(*args)
    new_dof = np.asarray(out[0])
    assert np.isfinite(new_dof).all()
    assert np.abs(new_dof).max() > 0

    mod.dryrun_multichip(8)


def test_sharded_newton_step_matches_single_device(eight_devices):
    """One sharded Newton step must match FEMSystem's single-device step."""
    from femcy_tpu.parallel.sharded import ShardedNewtonStep
    from femcy_tpu.solvers.cg import pcg_solve

    mesh = box_tets(3, 3, 3)
    mat = LinearIsotropic(100.0, 0.3)
    fixed = np.zeros(mesh.n_dof, dtype=bool)
    sval = np.zeros(mesh.n_dof)
    left = np.nonzero(mesh.nodes[:, 0] < 1e-9)[0]
    for d in range(3):
        fixed[left * 3 + d] = True
    right = np.nonzero(mesh.nodes[:, 0] > mesh.nodes[:, 0].max() - 1e-9)[0]
    rhs = np.zeros(mesh.n_dof)
    rhs[right * 3 + 1] = 0.2
    rng = np.random.default_rng(0)
    dof0 = 0.01 * rng.standard_normal(mesh.n_dof)

    # single-device reference (forced ELL to use the plain eval path)
    system = FEMSystem(
        mesh, mat, geometric_nonlinear=True,
        config=SolverConfig(sparse_format="ell", cg_eps=1e-10),
    )
    dof_p, values, residual, rms_ref, _ = system._jit_newton_eval(
        system._arrs, jnp.asarray(dof0), jnp.asarray(rhs), jnp.asarray(fixed),
        jnp.asarray(sval),
    )
    du, _, _ = pcg_solve(
        values,
        system._arrs["colidx"],
        system._arrs["diag_slot"],
        residual,
        eps=1e-10,
    )
    dof_ref = np.asarray(dof_p - du)

    # sharded step on 5 devices (includes row padding)
    stepper = ShardedNewtonStep(mesh, mat, devices=eight_devices[:5], cg_eps=1e-10)
    dof_new, rms, k = stepper.step(dof0, rhs, fixed, sval)
    assert k > 0
    np.testing.assert_allclose(float(rms), float(rms_ref), rtol=1e-9)
    scale = np.abs(dof_ref).max()
    np.testing.assert_allclose(
        np.asarray(dof_new) / scale, dof_ref / scale, atol=1e-8
    )
