"""Host direct sparse solve (scipy), the small-problem path.

Mirrors the reference crossover: below ``direct_solve_max_dof`` dofs the
system is flattened ELL -> CSR on the host and solved with
``scipy.sparse.linalg.spsolve`` (ref: stiffnessMtrx.py:219-251, 272-276).
Also serves as the cross-check oracle in tests.
"""

from __future__ import annotations

import numpy as np
import scipy.sparse.linalg as spla

from femcy_tpu.topology import ELLPattern


def direct_solve(pattern: ELLPattern, values, b) -> np.ndarray:
    K = pattern.to_scipy(np.asarray(values))
    return spla.spsolve(K.tocsc(), np.asarray(b))
