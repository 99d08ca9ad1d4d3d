from femcy_tpu.kernels.segsum import TiledSegsum, sorted_segment_sum_pallas

__all__ = ["TiledSegsum", "sorted_segment_sum_pallas"]
