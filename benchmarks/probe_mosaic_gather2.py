"""Probe 2: which gather forms lower in Mosaic (jax 0.9.0)?

Tests jnp.take_along_axis inside a TPU Pallas kernel in several shapes:
  A. rows via broadcast idx: table (S, 8), idx (nb, 8) = row_idx[:, None]
  B. per-lane sublane gather: table (S, 128), idx (nb, 128) random
  C. lane gather within vreg: table (8, 128), idx (8, 128) in [0,128)
  D. fallback decomposition: gather whole rows via one-hot (already known OK)
"""

import functools
import time

import jax

jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

r = np.random.default_rng(0)


def run_case(name, S, R, nb, B, per_lane, reps=20):
    table = jnp.asarray(r.normal(size=(S, R)), jnp.float32)
    if per_lane:
        idx = jnp.asarray(r.integers(0, S, (B, R)), jnp.int32)
    else:
        idx = jnp.asarray(
            np.broadcast_to(r.integers(0, S, (B, 1)), (B, R)), jnp.int32
        )

    def kernel(table_ref, idx_ref, out_ref):
        out_ref[:] = jnp.take_along_axis(table_ref[:], idx_ref[:], axis=0)

    def call(t, i):
        return pl.pallas_call(
            kernel,
            grid=(B // nb,),
            in_specs=[
                pl.BlockSpec((S, R), lambda i: (0, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((nb, R), lambda i: (i, 0),
                             memory_space=pltpu.VMEM),
            ],
            out_specs=pl.BlockSpec((nb, R), lambda i: (i, 0),
                                   memory_space=pltpu.VMEM),
            out_shape=jax.ShapeDtypeStruct((B, R), jnp.float32),
        )(t, i)

    try:
        t0 = time.time()
        c = jax.jit(call).lower(table, idx).compile()
        ct = time.time() - t0
        out = c(table, idx)
        got = np.asarray(out)
        ref = np.take_along_axis(np.asarray(table), np.asarray(idx), axis=0)
        err = np.abs(got - ref).max()
        t0 = time.time()
        for _ in range(reps):
            out = c(table, idx)
        _ = float(jnp.sum(out))
        ms = (time.time() - t0) / reps * 1e3
        print(f"{name}: {ms:8.3f} ms  maxerr={err}  (compile {ct:.0f}s)",
              flush=True)
    except Exception as e:
        print(f"{name}: FAILED {type(e).__name__}: {str(e)[:250]}", flush=True)


# C. within-vreg lane/sublane gathers first (most likely to work)
run_case("C1 table(8,128) idx(8,128) per-lane sublane-gather", 8, 128, 8, 8,
         True, reps=5)
run_case("C2 table(256,128) idx(256,128) per-lane", 256, 128, 256, 256, True,
         reps=5)
# A. broadcast row gather at flagship sizes
run_case("A1 table(32768,8) rows nb=2048", 32768, 8, 2048, 2**18, False)
run_case("A2 table(4096,8) rows nb=2048", 4096, 8, 2048, 2**18, False)
run_case("A3 table(32768,128) per-lane nb=512", 32768, 128, 512, 2**15, True,
         reps=5)
print("done", flush=True)
