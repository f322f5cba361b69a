"""Core enums, constants and helpers.

TPU-native re-design of the reference's core runtime layer
(reference: include/tiny-cuda-nn/common.h:133-248). Device-side utilities
(MatrixView, PitchedPtr, launch helpers) are intentionally absent: JAX arrays
are batch-leading row-major ``(batch, dim)`` and XLA owns scheduling/layout.
"""

from __future__ import annotations

import enum
from typing import Any, Dict, Iterable, Mapping, Optional

import jax.numpy as jnp
import numpy as np


class Activation(str, enum.Enum):
    """Activation functions (reference: common.h:133-144)."""

    ReLU = "ReLU"
    LeakyReLU = "LeakyReLU"
    SiLU = "SiLU"
    Exponential = "Exponential"
    Sine = "Sine"
    Sigmoid = "Sigmoid"
    Squareplus = "Squareplus"
    Softplus = "Softplus"
    Tanh = "Tanh"
    NONE = "None"


class GridType(str, enum.Enum):
    """Grid encoding storage types (reference: common.h:146-150)."""

    Hash = "Hash"
    Dense = "Dense"
    Tiled = "Tiled"


class HashType(str, enum.Enum):
    """Spatial hash families (reference: common.h:152-158).

    ``CoherentAdditive`` is a tcnn_tpu extension: ``idx = sum_d pos_d * f_d``
    (uint32 wrap) with ``f_0 = 1`` — like CoherentPrime but with + instead
    of XOR, which makes *all* cell corners reachable by static index
    offsets and unlocks the quad-row gather (one random access per cell
    instead of 2^d; see PLAN.md).
    """

    Prime = "Prime"
    CoherentPrime = "CoherentPrime"
    ReversedPrime = "ReversedPrime"
    Rng = "Rng"
    BaseConvert = "BaseConvert"
    CoherentAdditive = "CoherentAdditive"


class InterpolationType(str, enum.Enum):
    """Grid interpolation (reference: common.h:160-164)."""

    Nearest = "Nearest"
    Linear = "Linear"
    Smoothstep = "Smoothstep"


class ReductionType(str, enum.Enum):
    """Composite-encoding reduction (reference: common.h:178-182)."""

    Concatenation = "Concatenation"
    Sum = "Sum"
    Product = "Product"


class GradientMode(str, enum.Enum):
    """Parameter-gradient write mode (reference: object.h:116-120)."""

    Ignore = "Ignore"
    Overwrite = "Overwrite"
    Accumulate = "Accumulate"


# ---------------------------------------------------------------------------
# Constants
# ---------------------------------------------------------------------------

PI = 3.14159265358979323846

# The reference pads batches to multiples of 256 (common.h:246). On TPU the
# natural granularity is the 128-wide vector lane / MXU edge.
BATCH_SIZE_GRANULARITY = 128

# Squareplus / Softplus sharpness (reference: common_device.h:108).
K_ACT = 10.0

# Maximum number of multi-resolution grid levels
# (reference: encodings/multi_level_interface.h:84-88).
MAX_N_LEVELS = 128

# Default compute precision of networks. The reference uses fp16
# (network_precision_t, common.h:121-127); on TPU the MXU-native low
# precision is bfloat16.
default_network_precision = jnp.bfloat16


def default_loss_scale(dtype) -> float:
    """Loss scale used to keep small gradients representable.

    The reference uses 128 for fp16 and 1 for fp32 (common.h:240-244). We keep
    the same values for behavioral parity even though this framework
    accumulates gradients in fp32 (bf16's exponent range also makes scaling
    unnecessary); the scale is divided back out inside every optimizer step.
    """
    if jnp.dtype(dtype) == jnp.dtype(jnp.float32):
        return 1.0
    return 128.0


# ---------------------------------------------------------------------------
# Small helpers
# ---------------------------------------------------------------------------


def div_round_up(val: int, divisor: int) -> int:
    return (val + divisor - 1) // divisor


def next_multiple(val: int, divisor: int) -> int:
    return div_round_up(val, divisor) * divisor


def previous_multiple(val: int, divisor: int) -> int:
    return (val // divisor) * divisor


def is_pot(val: int) -> bool:
    return val > 0 and (val & (val - 1)) == 0


def next_pot(v: int) -> int:
    v = int(v) - 1
    for shift in (1, 2, 4, 8, 16):
        v |= v >> shift
    return v + 1


def powi(base: int, exp: int) -> int:
    return int(base) ** int(exp)


def lcm_list(values: Iterable[int]) -> int:
    import math

    out = 1
    for v in values:
        out = math.lcm(out, int(v))
    return out


# ---------------------------------------------------------------------------
# Morton codes (reference: common_device.h:934-974) — host/app-side helpers
# for spatially coherent sample ordering.
# ---------------------------------------------------------------------------


def _expand_bits_2d(w):
    w = w & np.uint64(0xFFFFFFFF)
    w = (w | (w << np.uint64(16))) & np.uint64(0x0000FFFF0000FFFF)
    w = (w | (w << np.uint64(8))) & np.uint64(0x00FF00FF00FF00FF)
    w = (w | (w << np.uint64(4))) & np.uint64(0x0F0F0F0F0F0F0F0F)
    w = (w | (w << np.uint64(2))) & np.uint64(0x3333333333333333)
    w = (w | (w << np.uint64(1))) & np.uint64(0x5555555555555555)
    return w


def _expand_bits_3d(w):
    w = w & np.uint64(0x1FFFFF)
    w = (w | (w << np.uint64(32))) & np.uint64(0x1F00000000FFFF)
    w = (w | (w << np.uint64(16))) & np.uint64(0x1F0000FF0000FF)
    w = (w | (w << np.uint64(8))) & np.uint64(0x100F00F00F00F00F)
    w = (w | (w << np.uint64(4))) & np.uint64(0x10C30C30C30C30C3)
    w = (w | (w << np.uint64(2))) & np.uint64(0x1249249249249249)
    return w


def morton2d(x, y):
    """Interleave bits of (x, y) uint arrays into 2D Morton codes."""
    x = np.asarray(x, np.uint64)
    y = np.asarray(y, np.uint64)
    return _expand_bits_2d(x) | (_expand_bits_2d(y) << np.uint64(1))


def morton3d(x, y, z):
    """Interleave bits of (x, y, z) uint arrays into 3D Morton codes
    (64-bit, up to 21 bits per axis)."""
    x = np.asarray(x, np.uint64)
    y = np.asarray(y, np.uint64)
    z = np.asarray(z, np.uint64)
    return (
        _expand_bits_3d(x)
        | (_expand_bits_3d(y) << np.uint64(1))
        | (_expand_bits_3d(z) << np.uint64(2))
    )


class CIDict(dict):
    """Case-insensitive string-keyed dict (reference: common_host.h:316-320).

    Keys keep their original case for display (``builtin_encodings()`` lists
    canonical names) but match case-insensitively.
    """

    def __init__(self, *args, **kwargs):
        super().__init__()
        self._canon: Dict[str, str] = {}
        if args:
            for k, v in dict(args[0]).items():
                self[k] = v
        for k, v in kwargs.items():
            self[k] = v

    def _k(self, key: str) -> str:
        return self._canon.get(key.lower(), key)

    def __setitem__(self, key, value):
        existing = self._canon.get(key.lower())
        if existing is not None:
            key = existing
        else:
            self._canon[key.lower()] = key
        super().__setitem__(key, value)

    def __getitem__(self, key):
        return super().__getitem__(self._k(key))

    def __contains__(self, key):
        return super().__contains__(self._k(key))

    def get(self, key, default=None):
        return super().get(self._k(key), default)

    def setdefault(self, key, default=None):
        if key in self:
            return self[key]
        self[key] = default
        return default

    def pop(self, key, *args):
        key = self._k(key)
        self._canon.pop(key.lower(), None)
        return super().pop(key, *args)


def equals_case_insensitive(a: str, b: str) -> bool:
    return a.lower() == b.lower()


def _make_enum_parser(enum_cls):
    table = CIDict({m.value: m for m in enum_cls})
    name = enum_cls.__name__

    def parse(value):
        if isinstance(value, enum_cls):
            return value
        if value in table:
            return table[value]
        raise ValueError(f"Invalid {name}: {value!r}")

    return parse


string_to_activation = _make_enum_parser(Activation)
string_to_grid_type = _make_enum_parser(GridType)
string_to_hash_type = _make_enum_parser(HashType)
string_to_interpolation_type = _make_enum_parser(InterpolationType)
string_to_reduction_type = _make_enum_parser(ReductionType)


def to_string(value) -> str:
    if isinstance(value, enum.Enum):
        return value.value
    return str(value)


def json_value(config: Optional[Mapping], key: str, default):
    """Case-insensitive ``json.value(key, default)`` analogue.

    The reference reads every config key with a default at the read site
    (e.g. grid.h:1728-1755); otype matching is case-insensitive.
    """
    if not config:
        return default
    if key in config:
        return config[key]
    lower = key.lower()
    for k, v in config.items():
        if isinstance(k, str) and k.lower() == lower:
            return v
    return default


def check_throw(cond: bool, msg: str = "check failed"):
    if not cond:
        raise RuntimeError(msg)


def as_dtype(precision) -> Any:
    """Resolve a config 'precision' entry to a jnp dtype."""
    if precision is None:
        return default_network_precision
    if isinstance(precision, str):
        table = CIDict({
            "bf16": jnp.bfloat16,
            "bfloat16": jnp.bfloat16,
            "f32": jnp.float32,
            "fp32": jnp.float32,
            "float32": jnp.float32,
            "float": jnp.float32,
            "f16": jnp.float16,
            "fp16": jnp.float16,
            "half": jnp.float16,
            "float16": jnp.float16,
        })
        if precision in table:
            return table[precision]
        raise ValueError(f"Unknown precision: {precision}")
    return jnp.dtype(precision)
