from se3diff_tpu.utils.logging import get_logger
from se3diff_tpu.utils.profiling import StepTimer, trace_profile

__all__ = ["get_logger", "StepTimer", "trace_profile"]
