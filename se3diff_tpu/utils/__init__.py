from se3diff_tpu.utils.compile_cache import enable_compilation_cache
from se3diff_tpu.utils.logging import get_logger
from se3diff_tpu.utils.profiling import (
    StepTimer,
    print_traceback_on_exception,
    trace_profile,
)

__all__ = [
    "enable_compilation_cache",
    "get_logger",
    "StepTimer",
    "print_traceback_on_exception",
    "trace_profile",
]
