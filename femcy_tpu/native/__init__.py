from femcy_tpu.native.loader import build_pattern_native, get_lib
