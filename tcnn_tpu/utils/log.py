"""Pluggable logging with severities.

Mirror of the reference's log-callback subsystem
(reference: common_host.h:46-69, src/common_host.cu:46-68): a single global
callback receives (severity, message); the default prints warnings/errors to
stderr and everything else only when verbose logging is on. Tests promote
warnings to failures by swapping the callback (cf. tests/test_common.h:48-55).
"""

from __future__ import annotations

import enum
import sys
from typing import Callable, Optional


class LogSeverity(enum.IntEnum):
    Debug = 0
    Info = 1
    Success = 2
    Warning = 3
    Error = 4


_verbose = False
_callback: Optional[Callable[[LogSeverity, str], None]] = None


def _default_callback(severity: LogSeverity, msg: str):
    if severity >= LogSeverity.Warning:
        prefix = "WARNING" if severity == LogSeverity.Warning else "ERROR"
        print(f"tcnn_tpu {prefix}: {msg}", file=sys.stderr)
    elif _verbose:
        print(f"tcnn_tpu: {msg}", file=sys.stderr)


def set_log_callback(callback: Optional[Callable[[LogSeverity, str], None]]):
    global _callback
    _callback = callback


def set_verbose(verbose: bool):
    global _verbose
    _verbose = bool(verbose)


def log(severity: LogSeverity, msg: str):
    (_callback or _default_callback)(severity, msg)


def log_debug(msg: str):
    log(LogSeverity.Debug, msg)


def log_info(msg: str):
    log(LogSeverity.Info, msg)


def log_success(msg: str):
    log(LogSeverity.Success, msg)


def log_warning(msg: str):
    log(LogSeverity.Warning, msg)


def log_error(msg: str):
    log(LogSeverity.Error, msg)
