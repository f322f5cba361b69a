"""Vectorized pcg32 jump-ahead on uint32 pairs (for HashType::Rng).

The reference's Rng grid hash (common_device.h:814-827) seeds a pcg32 with
1337, jumps it ahead by a per-vertex 64-bit step assembled from the grid
coordinates, and emits one uint32. JAX has no uint64 without global x64
mode, so the 64-bit LCG algebra runs on (hi, lo) uint32 pairs; the O(log n)
jump loop unrolls 64 statically with the per-bit multiplier/increment
constants precomputed in Python.
"""

from __future__ import annotations

import jax.numpy as jnp
import numpy as np

from ..rng import PCG32, PCG32_MULT

_MASK64 = (1 << 64) - 1
_U = jnp.uint32


def _mul32x32_64(a, b):
    """uint32 * uint32 -> (hi, lo) uint32 pair."""
    a0 = a & _U(0xFFFF)
    a1 = a >> _U(16)
    b0 = b & _U(0xFFFF)
    b1 = b >> _U(16)
    p00 = a0 * b0
    p01 = a0 * b1
    p10 = a1 * b0
    p11 = a1 * b1
    mid = (p00 >> _U(16)) + (p01 & _U(0xFFFF)) + (p10 & _U(0xFFFF))
    lo = (p00 & _U(0xFFFF)) | ((mid & _U(0xFFFF)) << _U(16))
    hi = p11 + (p01 >> _U(16)) + (p10 >> _U(16)) + (mid >> _U(16))
    return hi, lo


def _mul64_const(h, l, c: int):
    """(h,l) * c mod 2^64 with a Python-int constant c."""
    cl = _U(c & 0xFFFFFFFF)
    ch = _U((c >> 32) & 0xFFFFFFFF)
    hi, lo = _mul32x32_64(l, cl)
    hi = hi + l * ch + h * cl
    return hi, lo


def _add64_const(h, l, c: int):
    cl = _U(c & 0xFFFFFFFF)
    ch = _U((c >> 32) & 0xFFFFFFFF)
    lo = l + cl
    carry = (lo < l).astype(jnp.uint32)
    return h + ch + carry, lo


def pcg32_jump_output(delta_hi, delta_lo, seed: int = 1337):
    """For each element: pcg32(seed).advance(delta).next_uint().

    delta_hi/lo: uint32 arrays of equal shape; returns uint32 array.
    """
    base = PCG32(seed)
    state0 = int(base.state)
    inc = int(base.inc)

    acc_mult_h = jnp.zeros_like(delta_hi)
    acc_mult_l = jnp.ones_like(delta_lo)
    acc_plus_h = jnp.zeros_like(delta_hi)
    acc_plus_l = jnp.zeros_like(delta_lo)

    cur_mult = int(PCG32_MULT)
    cur_plus = inc
    for bit in range(64):
        if bit < 32:
            take = ((delta_lo >> _U(bit)) & _U(1)) != 0
        else:
            take = ((delta_hi >> _U(bit - 32)) & _U(1)) != 0
        nm_h, nm_l = _mul64_const(acc_mult_h, acc_mult_l, cur_mult)
        np_h, np_l = _mul64_const(acc_plus_h, acc_plus_l, cur_mult)
        np_h, np_l = _add64_const(np_h, np_l, cur_plus)
        acc_mult_h = jnp.where(take, nm_h, acc_mult_h)
        acc_mult_l = jnp.where(take, nm_l, acc_mult_l)
        acc_plus_h = jnp.where(take, np_h, acc_plus_h)
        acc_plus_l = jnp.where(take, np_l, acc_plus_l)
        cur_plus = ((cur_mult + 1) * cur_plus) & _MASK64
        cur_mult = (cur_mult * cur_mult) & _MASK64

    # state = acc_mult * state0 + acc_plus (mod 2^64)
    s_h, s_l = _mul64_const(acc_mult_h, acc_mult_l, state0)
    lo = s_l + acc_plus_l
    carry = (lo < s_l).astype(jnp.uint32)
    s_h = s_h + acc_plus_h + carry
    s_l = lo

    # output permutation of the (post-advance) state, which next_uint()
    # uses as its oldstate: xorshifted = ((s >> 18) ^ s) >> 27; rot = s >> 59.
    x_h = s_h >> _U(18)
    x_l = (s_l >> _U(18)) | (s_h << _U(14))
    x_h = x_h ^ s_h
    x_l = x_l ^ s_l
    # >> 27 of the 64-bit (x_h, x_l), take low 32 bits
    xorshifted = (x_l >> _U(27)) | (x_h << _U(5))
    rot = s_h >> _U(27)
    return (xorshifted >> rot) | (
        xorshifted << ((~rot + _U(1)) & _U(31))
    )
