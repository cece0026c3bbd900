from se3diff_tpu.utils.logging import get_logger
from se3diff_tpu.utils.profiling import (
    StepTimer,
    print_traceback_on_exception,
    trace_profile,
)

__all__ = [
    "get_logger",
    "StepTimer",
    "print_traceback_on_exception",
    "trace_profile",
]
