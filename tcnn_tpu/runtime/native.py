"""ctypes loader for the native runtime library (librtcnn.so).

Compiles ``rtcnn.cpp`` with g++ on first use (cached next to the source);
every entry point has a pure-Python fallback, so the framework works even
without a toolchain.
"""

from __future__ import annotations

import ctypes
import subprocess
import threading
from pathlib import Path

import numpy as np

_HERE = Path(__file__).resolve().parent
_SRC = _HERE / "rtcnn.cpp"
_LIB = _HERE / "librtcnn.so"

_lock = threading.Lock()
_lib = None
_tried = False


def _build() -> bool:
    try:
        subprocess.run(
            [
                "g++",
                "-O3",
                "-march=native",
                "-shared",
                "-fPIC",
                "-std=c++17",
                "-pthread",
                str(_SRC),
                "-o",
                str(_LIB),
            ],
            check=True,
            capture_output=True,
            timeout=120,
        )
        return True
    except Exception:
        return False


def _load():
    global _lib, _tried
    with _lock:
        if _tried:
            return _lib
        _tried = True
        if not _SRC.exists():
            return None
        if not _LIB.exists() or _LIB.stat().st_mtime < _SRC.stat().st_mtime:
            if not _build():
                return None
        try:
            lib = ctypes.CDLL(str(_LIB))
            lib.pcg32_next_floats.argtypes = [
                ctypes.POINTER(ctypes.c_uint64),  # state (in/out)
                ctypes.POINTER(ctypes.c_uint64),  # inc
                ctypes.c_uint64,  # n
                ctypes.POINTER(ctypes.c_float),  # out
            ]
            lib.pcg32_next_uints.argtypes = [
                ctypes.POINTER(ctypes.c_uint64),
                ctypes.POINTER(ctypes.c_uint64),
                ctypes.c_uint64,
                ctypes.POINTER(ctypes.c_uint32),
            ]
            lib.sampler_create.restype = ctypes.c_void_p
            lib.sampler_create.argtypes = [
                ctypes.POINTER(ctypes.c_float),  # image
                ctypes.c_int64,  # h
                ctypes.c_int64,  # w
                ctypes.c_int64,  # c
                ctypes.c_int64,  # batch
                ctypes.c_int,    # strata (0 = iid)
                ctypes.c_uint64,  # seed
                ctypes.c_int,    # n_buffers
            ]
            lib.sampler_next.argtypes = [
                ctypes.c_void_p,
                ctypes.POINTER(ctypes.c_float),
                ctypes.POINTER(ctypes.c_float),
            ]
            lib.sampler_destroy.argtypes = [ctypes.c_void_p]
            _lib = lib
        except Exception:
            _lib = None
        return _lib


def available() -> bool:
    return _load() is not None


class PCG32:
    """Native-backed PCG32 with the same API as tcnn_tpu.rng.PCG32."""

    def __init__(self, initstate: int = None, initseq: int = 1):
        from ..rng import PCG32 as PyPCG32

        py = PyPCG32(initstate, initseq)
        self.state = np.uint64(py.state)
        self.inc = np.uint64(py.inc)

    def _call(self, fn, n, dtype):
        out = np.empty(n, dtype=dtype)
        state = ctypes.c_uint64(int(self.state))
        inc = ctypes.c_uint64(int(self.inc))
        fn(
            ctypes.byref(state),
            ctypes.byref(inc),
            ctypes.c_uint64(n),
            out.ctypes.data_as(
                ctypes.POINTER(
                    ctypes.c_float if dtype == np.float32 else ctypes.c_uint32
                )
            ),
        )
        self.state = np.uint64(state.value)
        return out

    def next_uint(self, n: int = None):
        lib = _load()
        if n is None:
            return self._call(lib.pcg32_next_uints, 1, np.uint32)[0]
        return self._call(lib.pcg32_next_uints, n, np.uint32)

    def next_float(self, n: int = None):
        lib = _load()
        if n is None:
            return self._call(lib.pcg32_next_floats, 1, np.float32)[0]
        return self._call(lib.pcg32_next_floats, n, np.float32)

    def advance(self, delta: int):
        from ..rng import PCG32 as PyPCG32

        py = PyPCG32()
        py.state, py.inc = self.state, self.inc
        py.advance(delta)
        self.state = py.state
