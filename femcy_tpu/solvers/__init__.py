from femcy_tpu.solvers.cg import ell_spmv, pcg_solve
from femcy_tpu.solvers.direct import direct_solve

__all__ = ["ell_spmv", "pcg_solve", "direct_solve"]
