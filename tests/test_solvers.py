"""Linear-solver tests: PCG on manufactured SPD systems and assembled K."""

import jax.numpy as jnp
import numpy as np

from femcy_tpu.solvers.cg import ell_spmv, pcg_solve


def _random_spd_ell(n=60, bandwidth=7, seed=0):
    """Random banded SPD matrix in ELL form."""
    rng = np.random.default_rng(seed)
    dense = np.zeros((n, n))
    for i in range(n):
        for j in range(max(0, i - bandwidth // 2), min(n, i + bandwidth // 2 + 1)):
            if i <= j:
                v = rng.standard_normal() * 0.3
                dense[i, j] = v
                dense[j, i] = v
    dense += np.diag(np.abs(dense).sum(axis=1) + 1.0)  # diagonally dominant => SPD

    width = max((dense[i] != 0).sum() for i in range(n))
    values = np.zeros((n, width))
    colidx = np.zeros((n, width), dtype=np.int32)
    diag_slot = np.zeros(n, dtype=np.int64)
    for i in range(n):
        cols = np.nonzero(dense[i])[0]
        values[i, : len(cols)] = dense[i, cols]
        colidx[i, : len(cols)] = cols
        diag_slot[i] = i * width + np.where(cols == i)[0][0]
    return dense, values, colidx, diag_slot


def test_ell_spmv_matches_dense():
    dense, values, colidx, _ = _random_spd_ell()
    x = np.random.default_rng(1).standard_normal(dense.shape[0])
    y = np.asarray(ell_spmv(jnp.asarray(values), jnp.asarray(colidx), jnp.asarray(x)))
    np.testing.assert_allclose(y, dense @ x, rtol=1e-12)


def test_pcg_solves_spd_system():
    dense, values, colidx, diag_slot = _random_spd_ell()
    rng = np.random.default_rng(2)
    x_true = rng.standard_normal(dense.shape[0])
    b = dense @ x_true
    x, iters, rmax = pcg_solve(
        jnp.asarray(values),
        jnp.asarray(colidx),
        jnp.asarray(diag_slot),
        jnp.asarray(b),
        eps=1e-12,
    )
    np.testing.assert_allclose(np.asarray(x), x_true, atol=1e-8)
    assert int(iters) < dense.shape[0]


def test_pcg_zero_rhs():
    _, values, colidx, diag_slot = _random_spd_ell()
    b = jnp.zeros(values.shape[0])
    x, iters, _ = pcg_solve(
        jnp.asarray(values), jnp.asarray(colidx), jnp.asarray(diag_slot), b
    )
    np.testing.assert_allclose(np.asarray(x), 0.0)
    assert int(iters) == 0


def test_pcg_matches_reference_convergence_rule():
    """default eps=1e-3 on the infinity norm (ref: conjugateGradientSolver.py:15,124)."""
    dense, values, colidx, diag_slot = _random_spd_ell(seed=5)
    b = np.random.default_rng(3).standard_normal(dense.shape[0])
    x, iters, rmax = pcg_solve(
        jnp.asarray(values), jnp.asarray(colidx), jnp.asarray(diag_slot), jnp.asarray(b)
    )
    assert float(rmax) < 1e-3 * np.abs(b).max()


def test_ell_to_dense_roundtrip():
    from femcy_tpu.solvers.cg import ell_to_dense

    dense, values, colidx, _ = _random_spd_ell()
    A = np.asarray(
        ell_to_dense(jnp.asarray(values), jnp.asarray(colidx), dense.shape[0])
    )
    np.testing.assert_allclose(A, dense, rtol=0, atol=1e-14)


def test_dense_pcg_matches_sparse_pcg():
    """The small-model dense CG (dense_operator_max_dof) reproduces the ELL
    PCG solution, scalar- and block-Jacobi preconditioned."""
    from femcy_tpu.solvers.cg import dense_pcg_solve, ell_to_dense

    dense, values, colidx, diag_slot = _random_spd_ell(n=60)
    rng = np.random.default_rng(3)
    b = jnp.asarray(rng.standard_normal(60))
    x_ref, _, _ = pcg_solve(
        jnp.asarray(values), jnp.asarray(colidx), jnp.asarray(diag_slot), b,
        eps=1e-10,
    )
    A = ell_to_dense(jnp.asarray(values), jnp.asarray(colidx), 60)
    for block_dm in (0, 3):
        x, it, rmax = dense_pcg_solve(A, b, eps=1e-10, block_dm=block_dm)
        np.testing.assert_allclose(
            np.asarray(x), np.asarray(x_ref), rtol=0,
            atol=1e-8 * np.abs(np.asarray(x_ref)).max(),
        )


def test_fused_newton_dense_cg_e2e():
    """FEMSystem with dense_operator_max_dof: the full nonlinear fused-Newton
    analysis matches the sparse-CG run (same increments, same dofs)."""
    from femcy_tpu import FEMSystem, SolverConfig
    from femcy_tpu.materials import LinearIsotropic
    from femcy_tpu.meshgen import cantilever_tets
    from femcy_tpu.io.inp import DirichletBC, InpModel, NeumannBC

    mesh, fixed_nodes, loaded = cantilever_tets(6, 2)
    mat = LinearIsotropic(1000.0, 0.3)
    bcs = [DirichletBC(fixed_nodes, d, 0.0) for d in range(3)]
    lset = set(loaded.tolist())
    faces = [f for f in mesh.boundary if all(n in lset for n in f)]
    neumann = [NeumannBC(face_set=faces, traction=2.0,
                         direction=np.array([0.0, 0.0, 1.0]))]
    inp = InpModel(
        nodes=mesh.nodes, elements=mesh.elements, element_type="C3D4",
        node_sets={}, ele_sets={}, face_sets={}, dirichlet_bcs=bcs,
        neumann_bcs=neumann, material_type="Elastic",
        material_params=[1000.0, 0.3], geometric_nonlinear=True,
        time_incs=dict(ini_inc=0.5, max_time=1.0, min_inc=1e-4, max_inc=0.5),
    )
    results = {}
    for name, extra in (
        ("sparse", {}),
        ("dense", dict(dense_operator_max_dof=10_000)),
    ):
        cfg = SolverConfig(
            fused_newton=True, linear_solver="cg", newton_boost_max=0, **extra
        )
        system = FEMSystem(mesh, mat, True, config=cfg)
        report = system.solve(inp)
        assert report.success
        results[name] = (report.n_increments, np.asarray(system.dof))
    assert results["dense"][0] == results["sparse"][0]
    scale = np.abs(results["sparse"][1]).max()
    np.testing.assert_allclose(
        results["dense"][1] / scale, results["sparse"][1] / scale, atol=5e-4
    )
