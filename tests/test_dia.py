"""DIA (gather-free) sparse path: must agree exactly with the ELL path."""

import jax.numpy as jnp
import numpy as np
import pytest

from femcy_tpu import assembly
from femcy_tpu import bc as bc_mod
from femcy_tpu.materials import LinearIsotropic
from femcy_tpu.meshgen import box_tets
from femcy_tpu.solvers.cg import pcg_solve
from femcy_tpu.solvers.dia import (
    build_dia_pattern,
    build_structured_dia_pattern,
    dia_dirichlet_linear,
    dia_pcg_solve,
    dia_scatter,
    dia_spmv,
)
from femcy_tpu.topology import build_pattern


@pytest.fixture(scope="module")
def problem():
    mesh = box_tets(4, 3, 3)
    mat = LinearIsotropic(100.0, 0.3)
    ell = build_pattern(mesh)
    dia = build_dia_pattern(mesh, ell=ell)
    assert dia is not None
    dsdx, vol = assembly.gradients_and_volume(
        jnp.asarray(mesh.nodes),
        jnp.asarray(mesh.elements),
        jnp.asarray(mesh.element.dshape_at_gp),
        jnp.asarray(mesh.element.gauss_weights),
    )
    Ke = assembly.element_stiffness(dsdx, vol, jnp.asarray(mat.C))
    v_ell = assembly.scatter_stiffness(
        Ke, jnp.asarray(ell.ensure_scatter_targets()), ell.n_dof, ell.width
    )
    v_dia = dia_scatter(
        Ke, jnp.asarray(dia.scatter_targets), dia.n_dof, dia.n_offsets
    )
    return mesh, ell, dia, v_ell, v_dia


def test_dia_assembly_matches_ell(problem):
    mesh, ell, dia, v_ell, v_dia = problem
    # both layouts must describe the same matrix: compare dense
    dense_ell = ell.to_dense(np.asarray(v_ell))
    dense_dia = np.zeros_like(dense_ell)
    n = dia.n_dof
    vd = np.asarray(v_dia)
    for k, off in enumerate(dia.offsets):
        rows = np.arange(max(0, -off), min(n, n - off))
        dense_dia[rows, rows + off] = vd[rows, k]
    np.testing.assert_allclose(dense_dia, dense_ell, atol=1e-12)


def test_dia_spmv_matches_ell(problem):
    mesh, ell, dia, v_ell, v_dia = problem
    from femcy_tpu.solvers.cg import ell_spmv

    x = jnp.asarray(np.random.default_rng(0).standard_normal(dia.n_dof))
    y_ell = ell_spmv(v_ell, jnp.asarray(ell.colidx), x)
    y_dia = dia_spmv(v_dia, dia.offsets, x)
    np.testing.assert_allclose(np.asarray(y_dia), np.asarray(y_ell), atol=1e-10)


def test_dia_full_solve_matches_ell(problem):
    mesh, ell, dia, v_ell, v_dia = problem
    rng = np.random.default_rng(1)
    fixed = np.zeros(dia.n_dof, dtype=bool)
    left = np.nonzero(mesh.nodes[:, 0] < 1e-9)[0]
    for d in range(3):
        fixed[left * 3 + d] = True
    sval = np.where(fixed, 0.01, 0.0)
    rhs = rng.standard_normal(dia.n_dof) * 0.1

    ve, be = bc_mod.apply_dirichlet_linear(
        v_ell,
        jnp.asarray(ell.colidx),
        jnp.asarray(ell.diag_slot),
        jnp.asarray(rhs),
        jnp.asarray(fixed),
        jnp.asarray(sval),
    )
    x_ell, _, _ = pcg_solve(
        ve, jnp.asarray(ell.colidx), jnp.asarray(ell.diag_slot), be, eps=1e-12
    )

    vd, bd = dia_dirichlet_linear(
        v_dia, dia.offsets, dia.diag_idx, jnp.asarray(rhs), jnp.asarray(fixed),
        jnp.asarray(sval),
    )
    np.testing.assert_allclose(np.asarray(bd), np.asarray(be), atol=1e-12)
    x_dia, iters, _ = dia_pcg_solve(vd, dia.offsets, dia.diag_idx, bd, eps=1e-12)
    scale = np.abs(np.asarray(x_ell)).max()
    np.testing.assert_allclose(
        np.asarray(x_dia) / scale, np.asarray(x_ell) / scale, atol=1e-9
    )
    assert int(iters) > 0


def test_dia_rejects_wide_offset_sets():
    # a mesh with random node numbering has huge offset spread; the cap guards
    mesh = box_tets(4, 4, 4)
    rng = np.random.default_rng(2)
    perm = rng.permutation(mesh.n_nodes).astype(np.int32)
    from femcy_tpu.mesh import FEMesh

    shuffled = FEMesh(mesh.nodes[np.argsort(perm)], perm[mesh.elements], mesh.element)
    assert build_dia_pattern(shuffled, max_offsets=50) is None


def test_dia_block_jacobi_matches_scalar(problem):
    """Block-Jacobi PCG must reach the same solution (in fewer iterations)."""
    mesh, ell, dia, v_ell, v_dia = problem
    fixed = np.zeros(dia.n_dof, dtype=bool)
    left = np.nonzero(mesh.nodes[:, 0] < 1e-9)[0]
    for d in range(3):
        fixed[left * 3 + d] = True
    sval = np.zeros(dia.n_dof)
    rhs = np.random.default_rng(7).standard_normal(dia.n_dof) * 0.1
    vd, bd = dia_dirichlet_linear(
        v_dia, dia.offsets, dia.diag_idx, jnp.asarray(rhs), jnp.asarray(fixed),
        jnp.asarray(sval),
    )
    x_s, it_s, _ = dia_pcg_solve(vd, dia.offsets, dia.diag_idx, bd, eps=1e-10)
    x_b, it_b, _ = dia_pcg_solve(
        vd, dia.offsets, dia.diag_idx, bd, eps=1e-10, block_dm=3
    )
    scale = np.abs(np.asarray(x_s)).max()
    np.testing.assert_allclose(
        np.asarray(x_b) / scale, np.asarray(x_s) / scale, atol=1e-7
    )
    assert int(it_b) <= int(it_s)


@pytest.mark.parametrize("grid", [(2, 2, 2), (4, 3, 5), (3, 6, 2)])
def test_analytic_structured_pattern_matches_generic(grid):
    """The O(1) Kuhn-stencil DIA pattern equals the one derived from the
    full ELL pattern, on anisotropic grids (different strides per axis)."""
    mesh = box_tets(*grid)
    gen = build_dia_pattern(mesh, ell=build_pattern(mesh))
    ana = build_structured_dia_pattern(mesh)
    assert gen.offsets == ana.offsets
    assert gen.diag_idx == ana.diag_idx
    assert gen.n_dof == ana.n_dof


def test_dia_to_scipy_shifted_copy():
    """to_scipy (scipy dia_matrix shifted-copy construction) reproduces the
    assembled operator exactly: A_scipy @ x == dia_spmv(values) @ x."""
    mesh = box_tets(3, 4, 2)
    dia = build_structured_dia_pattern(mesh)
    from femcy_tpu.structured import build_structured_plan, structured_assemble

    plan = build_structured_plan(mesh, dia)
    dsdx, vol = assembly.gradients_and_volume(
        jnp.asarray(mesh.nodes),
        jnp.asarray(mesh.elements),
        jnp.asarray(mesh.element.dshape_at_gp),
        jnp.asarray(mesh.element.gauss_weights),
    )
    mat = LinearIsotropic(1000.0, 0.3)
    values = structured_assemble(dsdx, vol, jnp.asarray(mat.C), plan)
    A = dia.to_scipy(np.asarray(values))
    x = np.random.default_rng(3).standard_normal(dia.n_dof)
    y_scipy = A @ x
    y_dia = np.asarray(dia_spmv(values, dia.offsets, jnp.asarray(x)))
    np.testing.assert_allclose(y_scipy, y_dia, rtol=1e-12, atol=1e-12)
    # and it is symmetric, as an assembled stiffness must be
    assert abs(A - A.T).max() < 1e-9
