from .log import (
    LogSeverity,
    log,
    log_debug,
    log_error,
    log_info,
    log_success,
    log_warning,
    set_log_callback,
    set_verbose,
)

__all__ = [
    "LogSeverity",
    "log",
    "log_debug",
    "log_error",
    "log_info",
    "log_success",
    "log_warning",
    "set_log_callback",
    "set_verbose",
]
