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
