"""Boundary conditions: mask-based Dirichlet elimination + precomputed Neumann.

Dirichlet (linear path) reproduces the reference's symmetric zero-one
elimination (stiffnessMtrx.py:279-307) but as a deterministic masked update on
the whole ELL arrays instead of a racy per-node kernel: the rhs correction for
all fixed dofs is applied first, then fixed rows are overwritten with their
prescribed values, then rows/columns are zeroed and diagonals set to 1.

Neumann: the reference re-walks every loaded facet on the host each increment
(stiffnessMtrx.py:369-411).  The facet geometry is evaluated on the *initial*
configuration and the load enters linearly, so we precompute one unit nodal
force pattern per ``*Dsload`` at setup and scale it by traction x load_ratio
on device.  (Unlike the reference, multiple Neumann BCs sum instead of the
last one overwriting the rhs -- the ``rhs.fill(0.)`` inside the per-BC loop at
stiffnessMtrx.py:384 drops all but the last load; no fixture exercises that.)
"""

from __future__ import annotations

from typing import Callable, List, Optional, Tuple

import jax.numpy as jnp
import numpy as np

from femcy_tpu.io.inp import DirichletBC, NeumannBC
from femcy_tpu.mesh import FEMesh


# --------------------------------------------------------------------------- #
# Dirichlet
# --------------------------------------------------------------------------- #
def dirichlet_dof_indices(bc: DirichletBC, dm: int) -> np.ndarray:
    return np.asarray(bc.node_set, dtype=np.int64) * dm + bc.dof


def build_dirichlet_arrays(
    bcs: List[DirichletBC],
    mesh: FEMesh,
    time: float,
    load_ratio: float,
    user_fn: Optional[Callable] = None,
) -> Tuple[np.ndarray, np.ndarray]:
    """Combined (fixed_mask, prescribed_values) over all Dirichlet BCs.

    Later BCs overwrite earlier ones on shared dofs (reference applies them
    sequentially, stiffnessMtrx.py:519-529).  ``user=True`` BCs get their
    per-node values from ``user_fn`` (the user-subroutine hook,
    ref: user_defined/user_api.py) evaluated at ``time``; plain BCs use
    value * load_ratio (ref: stiffnessMtrx.py:687-688).
    """
    n_dof = mesh.n_dof
    fixed = np.zeros(n_dof, dtype=bool)
    sval = np.zeros(n_dof, dtype=np.float64)
    for bc in bcs:
        idx = dirichlet_dof_indices(bc, mesh.dm)
        fixed[idx] = True
        if bc.user:
            if user_fn is None:
                from femcy_tpu.user import default_user_dirichlet

                user_fn = default_user_dirichlet
            sval[idx] = user_fn(
                mesh.nodes[np.asarray(bc.node_set, dtype=np.int64)], bc.dof, time
            )
        else:
            sval[idx] = bc.value * load_ratio
    return fixed, sval


def apply_dirichlet_linear(values, colidx, diag_slot, rhs, fixed, sval):
    """Symmetric zero-one elimination for the linear solve path (jittable).

    values : (n_dof, W) ELL stiffness values
    colidx : (n_dof, W) column ids (padding points at col 0 with value 0)
    rhs : (n_dof,)
    fixed : (n_dof,) bool, sval : (n_dof,) prescribed values
    """
    col_fixed = fixed[colidx]  # (n_dof, W)
    # move prescribed-value couplings to the rhs (ref: stiffnessMtrx.py:293-298)
    rhs = rhs - jnp.sum(jnp.where(col_fixed, values * sval[colidx], 0.0), axis=1)
    rhs = jnp.where(fixed, sval, rhs)
    # zero fixed rows and columns, unit diagonal (ref: stiffnessMtrx.py:300-307)
    values = jnp.where(col_fixed | fixed[:, None], 0.0, values)
    flat = values.reshape(-1)
    diag_vals = jnp.where(fixed, 1.0, flat[diag_slot])
    return flat.at[diag_slot].set(diag_vals).reshape(values.shape), rhs


def apply_dirichlet_newton(values, colidx, diag_slot, residual, fixed):
    """Zero constrained residual rows + zero-one the Jacobian
    (ref: stiffnessMtrx.py:310-341)."""
    residual = jnp.where(fixed, 0.0, residual)
    values = jnp.where(fixed[colidx] | fixed[:, None], 0.0, values)
    flat = values.reshape(-1)
    diag_vals = jnp.where(fixed, 1.0, flat[diag_slot])
    return flat.at[diag_slot].set(diag_vals).reshape(values.shape), residual


def pin_dof(dof, fixed, sval):
    """Write prescribed values into dof (ref: stiffnessMtrx.py:344-366)."""
    return jnp.where(fixed, sval, dof)


# --------------------------------------------------------------------------- #
# Neumann
# --------------------------------------------------------------------------- #
def neumann_unit_pattern(mesh: FEMesh, bc: NeumannBC) -> np.ndarray:
    """Nodal force pattern of one ``*Dsload`` for unit traction (host, once).

    Same quadrature as the reference host loop (stiffnessMtrx.py:369-411):
    facet normals/measures from the element's facet tables on the initial
    configuration; pressure loads point along the outward normal, directional
    loads along the fixed direction.
    """
    dm = mesh.dm
    rhs = np.zeros(mesh.n_dof)
    boundary = mesh.boundary
    for facet in bc.face_set:
        ele = boundary[tuple(facet)]
        ele_nodes = mesh.elements[ele]
        ele_nodes_list = [int(n) for n in ele_nodes]
        local_facet = [ele_nodes_list.index(g) for g in facet]
        coords = mesh.nodes[ele_nodes]
        normals, aw, shape_vals = mesh.element.facet_quadrature(coords, local_facet)
        for q in range(normals.shape[0]):
            if bc.direction is None:
                flux = normals[q] * aw[q]
            else:
                flux = np.asarray(bc.direction)[:dm] * aw[q]
            for g in facet:
                nv = shape_vals[q, ele_nodes_list.index(g)]
                rhs[g * dm : g * dm + dm] += flux * nv
    return rhs


def build_neumann_patterns(mesh: FEMesh, bcs: List[NeumannBC]) -> Tuple[np.ndarray, np.ndarray]:
    """(patterns (n_bc, n_dof), tractions (n_bc,)) for all Neumann BCs."""
    if not bcs:
        return np.zeros((0, mesh.n_dof)), np.zeros((0,))
    patterns = np.stack([neumann_unit_pattern(mesh, bc) for bc in bcs])
    tractions = np.asarray([bc.traction for bc in bcs], dtype=np.float64)
    return patterns, tractions
