"""Pallas TPU kernels and kernel utilities."""

from .pallas_utils import interpret_mode, set_interpret_mode

__all__ = ["interpret_mode", "set_interpret_mode"]
