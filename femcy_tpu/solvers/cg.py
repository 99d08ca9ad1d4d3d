"""Jacobi-preconditioned conjugate gradient, fully on device.

The reference CG launches ~7 kernels per iteration and round-trips
alpha/beta/rmax through the host every loop (conjugateGradientSolver.py:103-127).
Here the whole iteration lives inside one ``jax.lax.while_loop`` under jit:
zero host synchronisation until the final result is fetched.  Same algorithm
and the same convergence rule for parity: ||r||_inf < eps * ||r0||_inf with
eps defaulting to 1e-3 (conjugateGradientSolver.py:15), at most n_dof
iterations (:109).
"""

from __future__ import annotations

from typing import Tuple

import jax
import jax.numpy as jnp


def ell_spmv(values, colidx, x):
    """y = A @ x on the padded ELL format.

    One row-gather + row-reduction; padding slots hold value 0 so their
    (arbitrary, col-0) gather contributes nothing.
    (ref: conjugateGradientSolver.py:53-58)
    """
    return jnp.sum(values * x[colidx], axis=1)


def pcg_solve(
    values,
    colidx,
    diag_slot,
    b,
    eps: float = 1.0e-3,
    max_iters: int = 0,
) -> Tuple[jax.Array, jax.Array, jax.Array]:
    """Solve A x = b.  Returns (x, iterations, final ||r||_inf).

    ``diag_slot`` indexes each row's diagonal in the flattened values array;
    the Jacobi preconditioner is M^-1 = 1/diag (ref:
    conjugateGradientSolver.py:48-51).
    """
    n = b.shape[0]
    if max_iters <= 0:
        max_iters = n
    diag = values.reshape(-1)[diag_slot]
    minv = jnp.where(diag != 0.0, 1.0 / diag, 0.0)

    r0 = b
    d0 = minv * r0
    x0 = jnp.zeros_like(b)
    rmax0 = jnp.max(jnp.abs(r0))

    def cond(state):
        _, r, _, _, k = state
        rmax = jnp.max(jnp.abs(r))
        return (k < max_iters) & (rmax >= eps * rmax0) & (rmax0 > 0.0)

    def body(state):
        x, r, d, rmr, k = state
        Ad = ell_spmv(values, colidx, d)
        alpha = rmr / jnp.dot(d, Ad)
        x = x + alpha * d
        r = r - alpha * Ad
        rmr_new = jnp.dot(r, minv * r)
        d = minv * r + (rmr_new / rmr) * d
        return x, r, d, rmr_new, k + 1

    rmr0 = jnp.dot(r0, minv * r0)
    x, r, _, _, k = jax.lax.while_loop(
        cond, body, (x0, r0, d0, rmr0, jnp.int32(0))
    )
    return x, k, jnp.max(jnp.abs(r))
