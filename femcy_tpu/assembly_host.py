"""Host (numpy, f64) twins of the device assembly -- the reference operator
for mixed-precision iterative refinement.

TPU-native precision story: f64 on TPU is software-emulated (~26x slower
element math, measured in README.md), but near-incompressible materials lose
O(1%) of the answer in f32 (tests/test_precision.py).  Iterative refinement
splits the difference: the BULK work (every inner linear solve) runs in f32
on the device; only one residual evaluation per outer iteration runs in f64
-- here, on the host against the exactly-assembled CSR operator, since numpy
f64 is free on the host and the models that need this are small.

Same math as assembly.py (cites: reference updated-Lagrangian assembly,
stiffnessMtrx.py:132-216); pure numpy, no JAX.
"""

from __future__ import annotations

import numpy as np

from femcy_tpu.mesh import FEMesh
from femcy_tpu.topology import ELLPattern


def b_matrix_host(dsdx: np.ndarray) -> np.ndarray:
    """Voigt B (same row order as assembly.b_matrix): (E, G, n, dm) ->
    (E, G, nv, n*dm)."""
    E, G, n, dm = dsdx.shape
    if dm == 2:
        B = np.zeros((E, G, 3, n * dm))
        Nx, Ny = dsdx[..., 0], dsdx[..., 1]
        B[:, :, 0, 0::2] = Nx
        B[:, :, 1, 1::2] = Ny
        B[:, :, 2, 0::2] = Ny
        B[:, :, 2, 1::2] = Nx
    else:
        B = np.zeros((E, G, 6, n * dm))
        Nx, Ny, Nz = dsdx[..., 0], dsdx[..., 1], dsdx[..., 2]
        B[:, :, 0, 0::3] = Nx
        B[:, :, 1, 1::3] = Ny
        B[:, :, 2, 2::3] = Nz
        B[:, :, 3, 0::3] = Ny
        B[:, :, 3, 1::3] = Nx
        B[:, :, 4, 0::3] = Nz
        B[:, :, 4, 2::3] = Nx
        B[:, :, 5, 1::3] = Nz
        B[:, :, 5, 2::3] = Ny
    return B


def element_stiffness_host(mesh: FEMesh, C: np.ndarray) -> np.ndarray:
    """f64 element stiffnesses on the initial configuration: (E, edof, edof)."""
    x = np.asarray(mesh.nodes, np.float64)[mesh.elements]
    dN = np.asarray(mesh.element.dshape_at_gp, np.float64)
    w = np.asarray(mesh.element.gauss_weights, np.float64)
    dxdn = np.einsum("enD,gnd->egDd", x, dN)
    inv = np.linalg.inv(dxdn)
    vol = np.linalg.det(dxdn) * w[None]
    dsdx = np.einsum("gnd,egdD->egnD", dN, inv)
    B = b_matrix_host(dsdx)
    return np.einsum(
        "egai,ab,egbj,eg->eij", B, np.asarray(C, np.float64), B, vol
    )


def assemble_csr_host(mesh: FEMesh, pattern: ELLPattern, C: np.ndarray):
    """The raw (no-BC) f64 global stiffness as scipy CSR."""
    Ke = element_stiffness_host(mesh, C)
    values = np.zeros(pattern.n_dof * pattern.width)
    np.add.at(values, pattern.scatter_targets, Ke.reshape(-1))
    return pattern.to_scipy(values.reshape(pattern.n_dof, pattern.width))


def dirichlet_csr_host(K, rhs, fixed, sval):
    """Symmetric zero-one elimination on the f64 CSR operator (the host twin
    of dia_dirichlet_linear / bc.apply_dirichlet_linear)."""
    import scipy.sparse as sp

    fixed = np.asarray(fixed, bool)
    sval = np.asarray(sval, np.float64)
    rhs = np.asarray(rhs, np.float64).copy()
    rhs -= K @ np.where(fixed, sval, 0.0)
    rhs[fixed] = sval[fixed]
    free = sp.diags((~fixed).astype(np.float64))
    K_bc = (free @ K @ free + sp.diags(fixed.astype(np.float64))).tocsr()
    return K_bc, rhs
