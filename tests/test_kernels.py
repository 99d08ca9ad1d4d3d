"""Pallas DIA SpMV kernel tests (interpreter mode on the CPU backend).

The kernel replaces the XLA shifted-slice SpMV inside the CG on TPU
(kernels/dia_spmv.py; 36x per-iteration speedup measured at NX=56).  Here it
is pinned exact against the XLA path on real structured operators.
"""

import jax.numpy as jnp
import numpy as np
import pytest

from femcy_tpu.kernels.dia_spmv import (
    make_spmv,
    pallas_spmv,
    pallas_spmv_plan,
    prep_values,
)
from femcy_tpu.materials import LinearIsotropic
from femcy_tpu.meshgen import box_tets
from femcy_tpu.solvers.dia import (
    build_structured_dia_pattern,
    dia_pcg_solve,
    dia_spmv,
)
from femcy_tpu.structured import (
    analytic_structured_dia_values,
    dia_dirichlet_linear_numpy,
)


def _operator(nx):
    mesh = box_tets(nx, nx, nx)
    dia = build_structured_dia_pattern(mesh)
    vals = analytic_structured_dia_values(
        mesh, LinearIsotropic(1000.0, 0.3).C, dia
    )
    fixed = np.zeros(mesh.n_dof, bool)
    bottom = np.nonzero(mesh.nodes[:, 2] < 1e-12)[0]
    for d in range(3):
        fixed[bottom * 3 + d] = True
    vals = dia_dirichlet_linear_numpy(vals, dia.offsets, dia.diag_idx, fixed)
    return mesh, dia, vals, fixed


@pytest.mark.parametrize("nx", [3, 5])
def test_pallas_spmv_exact_vs_slices(nx):
    mesh, dia, vals, _ = _operator(nx)
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.standard_normal(mesh.n_dof), jnp.float32)
    v32 = jnp.asarray(vals, jnp.float32)
    y_ref = dia_spmv(v32, dia.offsets, x)

    plan = pallas_spmv_plan(mesh.n_dof, dia.offsets, interpret=True)
    assert plan is not None
    y = pallas_spmv(plan, prep_values(plan, v32), x)
    np.testing.assert_allclose(
        np.asarray(y), np.asarray(y_ref), rtol=0,
        atol=1e-5 * float(jnp.abs(y_ref).max()),
    )


def test_pcg_with_pallas_spmv_matches(nx=4):
    mesh, dia, vals, fixed = _operator(nx)
    rng = np.random.default_rng(1)
    b = jnp.asarray(
        np.where(fixed, 0.0, rng.standard_normal(mesh.n_dof)), jnp.float32
    )
    v32 = jnp.asarray(vals, jnp.float32)
    x_ref, it_ref, _ = dia_pcg_solve(v32, dia.offsets, dia.diag_idx, b)
    spmv = make_spmv(mesh.n_dof, dia.offsets, interpret=True)
    assert spmv is not None
    x, it, _ = dia_pcg_solve(v32, dia.offsets, dia.diag_idx, b, spmv=spmv)
    scale = float(jnp.abs(x_ref).max())
    np.testing.assert_allclose(
        np.asarray(x) / scale, np.asarray(x_ref) / scale, atol=2e-5
    )


def test_multigrid_pcg_with_pallas_spmv(nx=8):
    from femcy_tpu.solvers.multigrid import StructuredMultigrid

    mesh, dia, vals, fixed = _operator(nx)
    mat = LinearIsotropic(1000.0, 0.3)
    mg = StructuredMultigrid(
        mesh, mat, fixed, dia=dia, coarsest_max_dof=400
    )
    rng = np.random.default_rng(2)
    b = jnp.asarray(
        np.where(fixed, 0.0, rng.standard_normal(mesh.n_dof)), jnp.float32
    )
    v32 = jnp.asarray(vals, jnp.float32)
    # production (TPU, x64 off) runs the whole hierarchy in f32; the test
    # backend builds it in f64, so cast the level operands down
    import jax

    ops = jax.tree.map(
        lambda a: a.astype(jnp.float32)
        if hasattr(a, "dtype") and a.dtype == jnp.float64
        else a,
        mg.operands(),
    )
    x_ref, _, _ = mg.pcg_solve(v32, b, eps=1e-5, ops=ops)
    spmv = make_spmv(mesh.n_dof, dia.offsets, interpret=True)
    x, _, _ = mg.pcg_solve(v32, b, eps=1e-5, ops=ops, spmv=spmv)
    scale = float(jnp.abs(x_ref).max())
    np.testing.assert_allclose(
        np.asarray(x) / scale, np.asarray(x_ref) / scale, atol=1e-4
    )


def test_make_spmv_chooser():
    mesh, dia, _, _ = _operator(3)
    # CPU platform without interpret -> unavailable
    assert make_spmv(mesh.n_dof, dia.offsets) is None
    # f64 operands -> unavailable (not a TPU-native dtype)
    assert (
        make_spmv(mesh.n_dof, dia.offsets, dtype=jnp.float64, interpret=True)
        is None
    )
    # a problem whose x vector cannot fit in VMEM -> unavailable
    assert pallas_spmv_plan(10_000_000, dia.offsets) is None
