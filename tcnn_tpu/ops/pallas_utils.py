"""Shared helpers for Pallas TPU kernels."""

from __future__ import annotations

from typing import Optional

import jax

_forced_interpret: Optional[bool] = None


def set_interpret_mode(value: Optional[bool]):
    """Force (True/False) or reset (None) Pallas interpreter mode."""
    global _forced_interpret
    _forced_interpret = value


def interpret_mode() -> bool:
    """Pallas kernels run in interpreter mode off-TPU (CPU tests, the
    multi-chip dry-run on host devices); compiled Mosaic on real TPUs."""
    if _forced_interpret is not None:
        return _forced_interpret
    return jax.default_backend() != "tpu"


def cdiv(a: int, b: int) -> int:
    return -(-a // b)
