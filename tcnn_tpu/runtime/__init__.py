"""Native (C++) runtime components.

The reference's native layer is CUDA compute plus host-side C++ runtime
(arena allocator, stream pools, NVRTC cache). On TPU the compute path is
JAX/XLA/Pallas and XLA owns memory/streams, so the native layer here is the
host-side support code where C++ genuinely pays off: the pcg32 parameter
initializer (bit-exact with the reference, ~20x faster than numpy for
multi-million-parameter grids). Built lazily with g++; pure-Python fallback
is automatic.
"""

from . import native

__all__ = ["native"]
