from femcy_tpu.utils.timing import Timer, device_trace

__all__ = ["Timer", "device_trace"]
