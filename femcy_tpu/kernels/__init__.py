from femcy_tpu.kernels.dia_spmv import make_spmv, pallas_spmv, pallas_spmv_plan

__all__ = ["make_spmv", "pallas_spmv", "pallas_spmv_plan"]
