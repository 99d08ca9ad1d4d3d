"""Slab-sharded structured solver (parallel/structured.py) on 8 virtual CPUs."""

import re

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from femcy_tpu.materials import LinearIsotropic
from femcy_tpu.meshgen import box_tets
from femcy_tpu.parallel.structured import (
    ShardedStructuredSolver,
    build_structured_shard_plan,
    stack_rows,
    unstack_rows,
)
from femcy_tpu.solvers.dia import (
    build_structured_dia_pattern,
    dia_dirichlet_linear,
    dia_pcg_solve,
)
from femcy_tpu.structured import analytic_structured_dia_values


def _problem(nx, ny, nz):
    mesh = box_tets(nx, ny, nz)
    mat = LinearIsotropic(1000.0, 0.3)
    fixed = np.zeros(mesh.n_dof, bool)
    bottom = np.nonzero(mesh.nodes[:, 2] < 1e-12)[0]
    top = np.nonzero(mesh.nodes[:, 2] > 1 - 1e-12)[0]
    for d in range(3):
        fixed[bottom * 3 + d] = True
    rhs = np.zeros(mesh.n_dof)
    rhs[top * 3] = 1.0
    sval = np.zeros(mesh.n_dof)
    return mesh, mat, fixed, rhs, sval


def test_stack_unstack_roundtrip():
    mesh, *_ = _problem(16, 3, 2)
    plan = build_structured_shard_plan(mesh, 8)
    v = np.arange(mesh.n_dof, dtype=float)
    blocks = stack_rows(plan, v)
    assert blocks.shape == (8, plan.local_rows)
    # duplicated plane: each block's last plane equals the next one's first
    for d in range(7):
        np.testing.assert_array_equal(
            blocks[d, -plan.ps :], blocks[d + 1, : plan.ps]
        )
    np.testing.assert_array_equal(unstack_rows(plan, blocks), v)


def test_sharded_structured_matches_single_device():
    """8-way slab solve == single-device DIA PCG to solver precision."""
    mesh, mat, fixed, rhs, sval = _problem(16, 5, 4)
    solver = ShardedStructuredSolver(mesh, mat, cg_eps=1e-10)
    x, iters = solver.solve(rhs, fixed, sval)
    assert iters > 0

    dia = build_structured_dia_pattern(mesh)
    vals = jnp.asarray(analytic_structured_dia_values(mesh, mat.C, dia))
    vals_bc, b = dia_dirichlet_linear(
        vals, dia.offsets, dia.diag_idx, jnp.asarray(rhs),
        jnp.asarray(fixed), jnp.asarray(sval),
    )
    x_ref, _, _ = dia_pcg_solve(
        vals_bc, dia.offsets, dia.diag_idx, b, eps=1e-10
    )
    scale = float(jnp.abs(x_ref).max())
    np.testing.assert_allclose(
        x / scale, np.asarray(x_ref) / scale, atol=1e-8
    )


def test_sharded_structured_nonzero_dirichlet():
    """Prescribed displacement flows through the rhs correction + duplicated
    plane consistently."""
    mesh, mat, fixed, rhs, sval = _problem(16, 4, 3)
    top = np.nonzero(mesh.nodes[:, 2] > 1 - 1e-12)[0]
    rhs[:] = 0.0
    for d in range(3):
        fixed[top * 3 + d] = True
    sval[top * 3 + 0] = 0.25  # shear the top face by prescription
    solver = ShardedStructuredSolver(mesh, mat, cg_eps=1e-10)
    x, _ = solver.solve(rhs, fixed, sval)
    np.testing.assert_allclose(x[top * 3 + 0], 0.25, atol=1e-12)

    dia = build_structured_dia_pattern(mesh)
    vals = jnp.asarray(analytic_structured_dia_values(mesh, mat.C, dia))
    vals_bc, b = dia_dirichlet_linear(
        vals, dia.offsets, dia.diag_idx, jnp.asarray(rhs),
        jnp.asarray(fixed), jnp.asarray(sval),
    )
    x_ref, _, _ = dia_pcg_solve(
        vals_bc, dia.offsets, dia.diag_idx, b, eps=1e-10
    )
    scale = float(jnp.abs(x_ref).max())
    np.testing.assert_allclose(x / scale, np.asarray(x_ref) / scale, atol=1e-8)


def test_sharded_structured_program_has_no_gather():
    """The compiled multi-chip program must be gather/scatter-free: halo
    ppermutes + static shifted slices only (the whole point of the DIA
    sharding vs the ELL row-gather path)."""
    mesh, mat, fixed, rhs, sval = _problem(16, 3, 3)
    solver = ShardedStructuredSolver(mesh, mat)
    solver._ensure_multigrid(fixed)
    plan = solver.plan
    put = lambda v: jax.device_put(  # noqa: E731
        jnp.asarray(v), solver._shard
    )
    args = (
        solver._dsdx_cell, solver._vol_cell, solver._C,
        put(stack_rows(plan, rhs)),
        put(stack_rows(plan, fixed)),
        put(stack_rows(plan, sval)),
        solver._own_d,
        solver._mg_arrs,
    )
    hlo = solver._step.lower(*args).compile().as_text()
    # " gather(" would also match "all-gather(": exclude collective names
    assert not re.search(r"[^\-]gather\(", hlo)
    assert not re.search(r"[^\-]scatter\(", hlo)


def test_sharded_multigrid_matches_and_cuts_iterations():
    """The slab-sharded V-cycle PCG (fine level sharded, coarse levels
    replicated after one all-reduced restriction) returns the same solution
    as Jacobi-PCG in far fewer iterations."""
    mesh, mat, fixed, rhs, sval = _problem(16, 8, 8)
    jac = ShardedStructuredSolver(mesh, mat, cg_eps=1e-8)
    x_j, it_j = jac.solve(rhs, fixed, sval)

    mg = ShardedStructuredSolver(
        mesh, mat, cg_eps=1e-8, preconditioner="multigrid"
    )
    x_m, it_m = mg.solve(rhs, fixed, sval)

    scale = np.abs(x_j).max()
    np.testing.assert_allclose(x_m / scale, x_j / scale, atol=1e-6)
    assert it_m < it_j / 4, (it_m, it_j)


def test_sharded_multigrid_rejects_odd_slabs():
    mesh = box_tets(16, 5, 4)  # odd ny cannot coarsen
    with pytest.raises(ValueError):
        ShardedStructuredSolver(mesh, LinearIsotropic(1000.0, 0.3),
                                preconditioner="multigrid")


def test_shard_plan_validation():
    mesh = box_tets(10, 3, 3)  # 10 % 8 != 0
    with pytest.raises(ValueError):
        build_structured_shard_plan(mesh, 8)


# --------------------------------------------------------------------------- #
# end-to-end through the user-facing API: SolverConfig(sharding="slab")
# --------------------------------------------------------------------------- #
def _nl_inp(mesh, uz=0.3):
    """Synthetic InpModel: clamp x=0, prescribe a transverse displacement on
    x=lx, geometric nonlinearity, two nominal load increments."""
    from femcy_tpu.io.inp import DirichletBC, InpModel

    lx = mesh.nodes[:, 0].max()
    left = np.nonzero(mesh.nodes[:, 0] < 1e-12)[0]
    right = np.nonzero(mesh.nodes[:, 0] > lx - 1e-12)[0]
    bcs = [DirichletBC(left, d, 0.0) for d in range(3)]
    bcs += [
        DirichletBC(right, 0, 0.0),
        DirichletBC(right, 1, 0.0),
        DirichletBC(right, 2, uz),
    ]
    return InpModel(
        nodes=mesh.nodes, elements=mesh.elements, element_type="C3D4",
        node_sets={}, ele_sets={}, face_sets={}, dirichlet_bcs=bcs,
        neumann_bcs=[], material_type="Elastic",
        material_params=[1000.0, 0.3], geometric_nonlinear=True,
        time_incs=dict(ini_inc=0.5, max_time=1.0, min_inc=1e-4, max_inc=0.5),
    )


def test_femsystem_sharded_linear_matches_single_device():
    """FEMSystem.solve with sharding='slab' == the single-device solve for a
    linear analysis (same .inp-model inputs through the public API)."""
    from femcy_tpu import FEMSystem, SolverConfig

    mesh = box_tets(16, 4, 4)
    mat = LinearIsotropic(1000.0, 0.3)
    inp = _nl_inp(mesh)
    inp.geometric_nonlinear = False

    s1 = FEMSystem(mesh, mat, False, SolverConfig(linear_solver="cg", cg_eps=1e-10))
    r1 = s1.solve(inp)
    s2 = FEMSystem(
        mesh, mat, False,
        SolverConfig(linear_solver="cg", cg_eps=1e-10, sharding="slab"),
    )
    r2 = s2.solve(inp)
    assert r1.success and r2.success
    u1 = np.asarray(s1.dof)
    u2 = np.asarray(s2.dof)
    scale = np.abs(u1).max()
    np.testing.assert_allclose(u2 / scale, u1 / scale, atol=1e-8)


def test_femsystem_sharded_nonlinear_end_to_end_matches_single_device():
    """The FULL adaptive-stepping geometric-nonlinear Newton analysis runs
    slab-sharded over 8 devices through FEMSystem.solve and pins the
    single-device path: same increment count, same Newton iteration counts,
    same converged dof field."""
    from femcy_tpu import FEMSystem, SolverConfig

    mesh = box_tets(16, 4, 4)
    mat = LinearIsotropic(1000.0, 0.3)
    inp = _nl_inp(mesh)

    s1 = FEMSystem(
        mesh, mat, True, SolverConfig(linear_solver="cg", cg_eps=1e-10)
    )
    r1 = s1.solve(inp)
    assert r1.success

    s2 = FEMSystem(
        mesh, mat, True,
        SolverConfig(linear_solver="cg", cg_eps=1e-10, sharding="slab"),
    )
    r2 = s2.solve(inp)
    assert r2.success

    assert r2.n_increments == r1.n_increments
    assert [i.newton_iters for i in r2.increments] == [
        i.newton_iters for i in r1.increments
    ]
    u1 = np.asarray(s1.dof)
    u2 = np.asarray(s2.dof)
    scale = np.abs(u1).max()
    assert scale > 0.1  # the analysis actually deformed the body
    np.testing.assert_allclose(u2 / scale, u1 / scale, atol=1e-7)

    # post-processing flows through the same public API
    e1 = s1.elastic_energy()
    e2 = s2.elastic_energy()
    np.testing.assert_allclose(e2, e1, rtol=1e-6)
    _, _, mises1 = s1.compute_strain_stress()
    _, _, mises2 = s2.compute_strain_stress()
    np.testing.assert_allclose(
        np.asarray(mises2), np.asarray(mises1),
        rtol=1e-5, atol=1e-8 * float(np.max(np.asarray(mises1))),
    )


def test_slab_consistent_tangent_matches_single_device():
    """SolverConfig(sharding="slab", tangent="consistent"): the exact Newton
    tangent (assembly.consistent_tangent_elems, scanned per-element JVPs)
    composes with slab sharding -- same increments, same Newton iteration
    counts, same converged dof as the single-device consistent-tangent run.
    With this, BOTH sharded modes accept both tangents (VERDICT r3
    weakness 7)."""
    from femcy_tpu import FEMSystem, SolverConfig

    mesh = box_tets(16, 4, 4)
    mat = LinearIsotropic(1000.0, 0.3)
    inp = _nl_inp(mesh)

    runs = {}
    for name, cfg in (
        ("single", SolverConfig(linear_solver="cg", cg_eps=1e-10,
                                tangent="consistent", newton_boost_max=0)),
        ("slab", SolverConfig(linear_solver="cg", cg_eps=1e-10,
                              sharding="slab", tangent="consistent",
                              newton_boost_max=0)),
    ):
        system = FEMSystem(mesh, mat, True, config=cfg)
        report = system.solve(inp)
        assert report.success
        runs[name] = (report, np.asarray(system.dof), system.elastic_energy())

    rs, us, es = runs["single"]
    rb, ub, eb = runs["slab"]
    assert rb.n_increments == rs.n_increments
    assert [r.newton_iters for r in rb.increments] == [
        r.newton_iters for r in rs.increments
    ]
    scale = np.abs(us).max()
    assert scale > 0.1
    np.testing.assert_allclose(ub / scale, us / scale, atol=1e-7)
    np.testing.assert_allclose(eb, es, rtol=1e-6)


def test_femsystem_sharded_rejects_unstructured():
    from femcy_tpu import FEMesh, FEMSystem, SolverConfig
    from femcy_tpu.meshgen import cantilever_tets

    mesh, _, _ = cantilever_tets(4, 2)
    with pytest.raises(ValueError, match="slab"):
        FEMSystem(
            FEMesh(mesh.nodes, mesh.elements, mesh.element),
            LinearIsotropic(1000.0, 0.3),
            config=SolverConfig(sharding="slab"),
        )
