"""Structured scatter-free assembly must match the general DIA scatter."""

import jax.numpy as jnp
import numpy as np

from femcy_tpu import assembly
from femcy_tpu.materials import LinearIsotropic
from femcy_tpu.meshgen import box_tets
from femcy_tpu.solvers.dia import build_dia_pattern, dia_scatter
from femcy_tpu.structured import build_structured_plan, structured_dia_scatter
from femcy_tpu.topology import build_pattern


def test_structured_scatter_matches_general():
    mesh = box_tets(3, 4, 2)
    ell = build_pattern(mesh)
    dia = build_dia_pattern(mesh, ell=ell)
    mat = LinearIsotropic(1000.0, 0.3)
    dsdx, vol = assembly.gradients_and_volume(
        jnp.asarray(mesh.nodes),
        jnp.asarray(mesh.elements),
        jnp.asarray(mesh.element.dshape_at_gp),
        jnp.asarray(mesh.element.gauss_weights),
    )
    Ke = assembly.element_stiffness(dsdx, vol, jnp.asarray(mat.C))
    v_ref = dia_scatter(
        Ke, jnp.asarray(dia.scatter_targets), dia.n_dof, dia.n_offsets
    )
    plan = build_structured_plan(mesh, dia)
    v_str = structured_dia_scatter(Ke, plan)
    np.testing.assert_allclose(np.asarray(v_str), np.asarray(v_ref), atol=1e-12)
