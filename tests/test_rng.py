"""PCG32 bit-exactness tests (vs a straight-line scalar implementation of
the published algorithm, reference: dependencies/pcg32/pcg32.h)."""

import numpy as np

from tcnn_tpu.rng import PCG32, PCG32_MULT, make_rng

MASK = (1 << 64) - 1


def scalar_pcg32_stream(seed, n):
    # Straightforward scalar reimplementation for cross-checking.
    state, inc = 0, (1 << 1) | 1

    def next_uint():
        nonlocal state
        old = state
        state = (old * int(PCG32_MULT) + inc) & MASK
        xs = (((old >> 18) ^ old) >> 27) & 0xFFFFFFFF
        rot = old >> 59
        return ((xs >> rot) | (xs << ((-rot) & 31))) & 0xFFFFFFFF

    next_uint()
    state = (state + seed) & MASK
    next_uint()
    return [next_uint() for _ in range(n)]


def test_vectorized_matches_scalar():
    for seed in (1337, 42, 2**63):
        for n in (1, 2, 7, 64, 1000):
            r = PCG32(seed)
            got = list(r.next_uint(n))
            assert got == scalar_pcg32_stream(seed, n)


def test_sequential_draws_continue_stream():
    r1 = PCG32(7)
    a = list(r1.next_uint(10)) + list(r1.next_uint(23))
    r2 = PCG32(7)
    b = list(r2.next_uint(33))
    assert a == b


def test_next_float_range_and_determinism():
    r = PCG32(123)
    f = r.next_float(10000)
    assert f.dtype == np.float32
    assert (f >= 0).all() and (f < 1).all()
    assert abs(f.mean() - 0.5) < 0.02


def test_native_matches_python():
    nat = make_rng(99)
    py = PCG32(99)
    if type(nat).__module__.endswith("rng"):
        return  # native unavailable; nothing to compare
    assert list(nat.next_uint(257)) == list(py.next_uint(257))
    np.testing.assert_array_equal(nat.next_float(64), py.next_float(64))


def test_advance():
    r1 = PCG32(5)
    r1.next_uint(100)
    r2 = PCG32(5)
    r2.advance(100)
    assert r1.next_uint() == r2.next_uint()
