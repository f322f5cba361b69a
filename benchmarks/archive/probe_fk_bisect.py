#!/usr/bin/env python
"""Bisect which construct in the fused factored-scatter kernel crashes the
Mosaic remote compiler (HTTP 500). Each case is a tiny standalone kernel."""

import functools
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

jax.config.update(
    "jax_compilation_cache_dir",
    str(Path(__file__).resolve().parent.parent / ".jax_cache"),
)
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

SUB = 1024
HI = 1024
LO = 32
R = 8
NSUB = 4  # small: 4 sub-chunks per grid step
GRID = 2


def try_case(name, kernel, out_shape, *args):
    try:
        t0 = time.time()
        fn = jax.jit(
            lambda *a: pl.pallas_call(
                kernel,
                grid=(GRID,),
                in_specs=[
                    pl.BlockSpec((1, NSUB, SUB), lambda b: (b, 0, 0),
                                 memory_space=pltpu.VMEM),
                    pl.BlockSpec((NSUB * SUB, R), lambda b: (b, 0),
                                 memory_space=pltpu.VMEM),
                ],
                out_specs=pl.BlockSpec(
                    (1,) + out_shape, lambda b: (b, 0, 0),
                    memory_space=pltpu.VMEM),
                out_shape=jax.ShapeDtypeStruct((GRID,) + out_shape,
                                               jnp.float32),
            )(*a)
        )
        out = fn(*args)
        out.block_until_ready()
        print(f"OK   {name} ({time.time()-t0:.0f}s)", flush=True)
        return True
    except Exception as e:
        print(f"FAIL {name}: {type(e).__name__}: {str(e)[:150]}", flush=True)
        return False


def main():
    print("backend:", jax.default_backend(), flush=True)
    r = np.random.default_rng(0)
    B = GRID * NSUB * SUB
    idx3 = jnp.asarray(
        r.integers(0, HI * LO, (GRID, NSUB, SUB)), jnp.int32
    )
    rows = jnp.asarray(r.normal(size=(B, R)).astype(np.float32))

    # 1. one-hot transposed matmul only (no strip): out (HI, SUB->R pad)
    def k1(idx_ref, rows_ref, out_ref):
        acc = jnp.zeros((HI, 256), jnp.float32)
        iota_hi = jax.lax.broadcasted_iota(jnp.int32, (HI, SUB), 0)
        for k in range(NSUB):
            hi = (idx_ref[0, k, :] // LO).reshape(1, SUB)
            onehot_t = (iota_hi == hi).astype(jnp.bfloat16)
            s = jnp.pad(rows_ref[k * SUB:(k + 1) * SUB, :], ((0, 0), (0, 248))
                        ).astype(jnp.bfloat16)
            acc += jnp.dot(onehot_t, s, preferred_element_type=jnp.float32)
        out_ref[...] = acc[None]

    try_case("onehot_matmul_pad", k1, (HI, 256), idx3, rows)

    # 2. strip via 3D iota + where + reshape
    def k2(idx_ref, rows_ref, out_ref):
        acc = jnp.zeros((HI, LO * R), jnp.float32)
        iota_hi = jax.lax.broadcasted_iota(jnp.int32, (HI, SUB), 0)
        iota_lo = jax.lax.broadcasted_iota(jnp.int32, (SUB, LO, R), 1)
        for k in range(NSUB):
            idx = idx_ref[0, k, :]
            rws = rows_ref[k * SUB:(k + 1) * SUB, :]
            hi = (idx // LO).reshape(1, SUB)
            lo = (idx % LO).reshape(SUB, 1, 1)
            onehot_t = (iota_hi == hi).astype(jnp.bfloat16)
            strip = jnp.where(
                iota_lo == lo, rws[:, None, :], 0.0
            ).reshape(SUB, LO * R).astype(jnp.bfloat16)
            acc += jnp.dot(onehot_t, strip,
                           preferred_element_type=jnp.float32)
        out_ref[...] = acc[None]

    try_case("strip_3d_reshape", k2, (HI, LO * R), idx3, rows)

    # 3. strip via 2D repeat + iota mask (no 3D intermediates)
    def k3(idx_ref, rows_ref, out_ref):
        acc = jnp.zeros((HI, LO * R), jnp.float32)
        iota_hi = jax.lax.broadcasted_iota(jnp.int32, (HI, SUB), 0)
        col_lo = jax.lax.broadcasted_iota(jnp.int32, (SUB, LO * R), 1) // R
        for k in range(NSUB):
            idx = idx_ref[0, k, :]
            rws = rows_ref[k * SUB:(k + 1) * SUB, :]
            hi = (idx // LO).reshape(1, SUB)
            lo = (idx % LO).reshape(SUB, 1)
            onehot_t = (iota_hi == hi).astype(jnp.bfloat16)
            tiled = pltpu.repeat(rws, LO, axis=1)  # (SUB, LO*R)
            strip = jnp.where(col_lo == lo, tiled, 0.0).astype(jnp.bfloat16)
            acc += jnp.dot(onehot_t, strip,
                           preferred_element_type=jnp.float32)
        out_ref[...] = acc[None]

    try_case("strip_2d_repeat", k3, (HI, LO * R), idx3, rows)

    # 4. like 3 but fori_loop over sub-chunks instead of python unroll
    def k4(idx_ref, rows_ref, out_ref):
        iota_hi = jax.lax.broadcasted_iota(jnp.int32, (HI, SUB), 0)
        col_lo = jax.lax.broadcasted_iota(jnp.int32, (SUB, LO * R), 1) // R

        def body(k, acc):
            idx = idx_ref[0, k, :]
            rws = rows_ref[pl.ds(k * SUB, SUB), :]
            hi = (idx // LO).reshape(1, SUB)
            lo = (idx % LO).reshape(SUB, 1)
            onehot_t = (iota_hi == hi).astype(jnp.bfloat16)
            tiled = pltpu.repeat(rws, LO, axis=1)
            strip = jnp.where(col_lo == lo, tiled, 0.0).astype(jnp.bfloat16)
            return acc + jnp.dot(onehot_t, strip,
                                 preferred_element_type=jnp.float32)

        acc = jax.lax.fori_loop(
            0, NSUB, body, jnp.zeros((HI, LO * R), jnp.float32)
        )
        out_ref[...] = acc[None]

    try_case("strip_2d_fori", k4, (HI, LO * R), idx3, rows)


if __name__ == "__main__":
    main()
