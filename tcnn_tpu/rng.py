"""PCG32 random number generator (vectorized, host-side).

Bit-exact reimplementation of the PCG32 algorithm (M.E. O'Neill,
www.pcg-random.org) that the reference uses for parameter initialization
(reference: dependencies/pcg32/pcg32.h, trainer.h:81-84). Runs on the host in
numpy; parameter init happens once, so there is no reason to burn a TPU
kernel on it. A C++ implementation with identical output lives in
``tcnn_tpu/runtime`` and is used when available (it is ~20x faster for
multi-million-parameter grids).
"""

from __future__ import annotations

import numpy as np

PCG32_DEFAULT_STATE = np.uint64(0x853C49E6748FEA9B)
PCG32_DEFAULT_STREAM = np.uint64(0xDA3E39CB94B95BDB)
PCG32_MULT = np.uint64(0x5851F42D4C957F2D)

_u64 = np.uint64
_u32 = np.uint32


class PCG32:
    """Scalar-state PCG32 with batched draws."""

    def __init__(self, initstate: int = None, initseq: int = 1):
        if initstate is None:
            self.state = PCG32_DEFAULT_STATE
            self.inc = PCG32_DEFAULT_STREAM
        else:
            self.seed(initstate, initseq)

    def seed(self, initstate: int, initseq: int = 1):
        with np.errstate(over="ignore"):
            self.state = _u64(0)
            self.inc = _u64((int(initseq) << 1 | 1) & 0xFFFFFFFFFFFFFFFF)
            self.next_uint()
            self.state = _u64((int(self.state) + int(initstate)) & 0xFFFFFFFFFFFFFFFF)
            self.next_uint()

    def next_uint(self, n: int = None):
        """One uint32 draw (n=None) or an array of n draws."""
        if n is None:
            return self._draw(1)[0]
        return self._draw(n)

    def _draw(self, n: int) -> np.ndarray:
        # The LCG is an affine recurrence s' = a*s + c (mod 2^64); the whole
        # state sequence is materialized with O(log n) vectorized doubling
        # steps instead of n scalar steps.
        mask = (1 << 64) - 1
        states = np.empty(n, dtype=np.uint64)
        states[0] = self.state
        filled = 1
        a_k = int(PCG32_MULT)  # affine coefficients for a jump of `filled`
        c_k = int(self.inc)
        with np.errstate(over="ignore"):
            while filled < n:
                take = min(filled, n - filled)
                states[filled : filled + take] = (
                    states[:take] * _u64(a_k) + _u64(c_k)
                )
                filled += take
                c_k = (a_k * c_k + c_k) & mask
                a_k = (a_k * a_k) & mask
        out = self._output(states)
        # Advance scalar state past the drawn block.
        last = int(states[n - 1])
        self.state = _u64((last * int(PCG32_MULT) + int(self.inc)) & mask)
        return out

    @staticmethod
    def _output(oldstate: np.ndarray) -> np.ndarray:
        xorshifted = ((oldstate >> _u64(18)) ^ oldstate) >> _u64(27)
        xorshifted = xorshifted.astype(np.uint32)
        rot = (oldstate >> _u64(59)).astype(np.uint32)
        return (xorshifted >> rot) | (
            xorshifted << ((~rot + _u32(1)) & _u32(31))
        )

    def next_float(self, n: int = None):
        """Uniform float32 in [0, 1): generate in [1,2) and subtract 1."""
        bits = self.next_uint(n)
        bits = (np.asarray(bits, dtype=np.uint32) >> _u32(9)) | _u32(0x3F800000)
        out = bits.view(np.float32) - np.float32(1.0)
        if n is None:
            return out.reshape(())[()]
        return out

    def advance(self, delta: int):
        """Multi-step jump-ahead (O(log n) modular exponentiation)."""
        cur_mult = int(PCG32_MULT)
        cur_plus = int(self.inc)
        acc_mult = 1
        acc_plus = 0
        mask = (1 << 64) - 1
        delta = delta & mask
        while delta > 0:
            if delta & 1:
                acc_mult = (acc_mult * cur_mult) & mask
                acc_plus = (acc_plus * cur_mult + cur_plus) & mask
            cur_plus = ((cur_mult + 1) * cur_plus) & mask
            cur_mult = (cur_mult * cur_mult) & mask
            delta >>= 1
        self.state = _u64((acc_mult * int(self.state) + acc_plus) & mask)


def _try_native():
    try:
        from .runtime import native  # noqa: PLC0415

        return native if native.available() else None
    except Exception:
        return None


_native = None
_native_checked = False


def make_rng(seed: int = 1337):
    """Default RNG factory mirroring ``default_rng_t`` usage."""
    global _native, _native_checked
    if not _native_checked:
        _native = _try_native()
        _native_checked = True
    if _native is not None:
        return _native.PCG32(seed)
    return PCG32(seed)


# ---- batched distributions (reference: random.h:38-85) --------------------


def generate_random_uniform(rng, n: int, low: float = 0.0, high: float = 1.0):
    return (rng.next_float(n) * (high - low) + low).astype(np.float32)


def generate_random_logistic(rng, n: int, mean: float = 0.0, stddev: float = 1.0):
    u = rng.next_float(n).astype(np.float64)
    u = np.clip(u, 1e-12, 1 - 1e-12)
    out = mean + stddev * 0.551328895421792050 * np.log(u / (1 - u))
    return out.astype(np.float32)
