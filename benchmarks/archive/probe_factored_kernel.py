#!/usr/bin/env python
"""A/B the fused Pallas factored scatter vs the XLA strip form, standalone
and through the gather VJP, at flagship fine-level shapes.

Run ON TPU (one process at a time):
    python benchmarks/probe_factored_kernel.py > _probe_fk.txt 2>&1
"""

import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

import jax
import jax.numpy as jnp
import numpy as np

cache_dir = Path(__file__).resolve().parent.parent / ".jax_cache"
jax.config.update("jax_compilation_cache_dir", str(cache_dir))
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

from tcnn_tpu.ops.scatter_rows import (  # noqa: E402
    scatter_rows_factored,
    scatter_rows_factored_pallas,
)


def timeit(fn, *args, n=30):
    out = fn(*args)
    _ = float(jnp.sum(out))  # sync (tunnel-safe)
    t0 = time.perf_counter()
    for _i in range(n):
        out = fn(*args)
    _ = float(jnp.sum(out))
    return (time.perf_counter() - t0) / n * 1e3


def main():
    print("backend:", jax.default_backend(), flush=True)
    r = np.random.default_rng(0)
    B, S, R = 2**18, 2**15, 8
    idx = jnp.asarray(r.integers(0, S, B), jnp.int32)
    rows = jnp.asarray(r.normal(size=(B, R)).astype(np.float32))

    ref = np.zeros((S, R), np.float32)
    np.add.at(ref, np.asarray(idx), np.asarray(rows))

    variants = {
        "xla_factored_pair": jax.jit(
            lambda i, v: scatter_rows_factored(i, v, S)
        ),
        "pallas_pair": jax.jit(
            lambda i, v: scatter_rows_factored_pallas(i, v, S)
        ),
        "pallas_bf16": jax.jit(
            lambda i, v: scatter_rows_factored_pallas(i, v, S, pair=False)
        ),
        "pallas_pair_sub2048": jax.jit(
            lambda i, v: scatter_rows_factored_pallas(i, v, S, sub=2048)
        ),
        "pallas_pair_lo64": jax.jit(
            lambda i, v: scatter_rows_factored_pallas(i, v, S, lo_width=64)
        ),
        "xla_scatter_emitter": jax.jit(
            lambda i, v: jnp.zeros((S, R), jnp.float32)
            .at[i]
            .add(v, mode="promise_in_bounds")
        ),
    }
    for name, fn in variants.items():
        try:
            got = np.asarray(fn(idx, rows))
            err = float(
                np.abs(got - ref).max() / (np.abs(ref).max() + 1e-9)
            )
            ms = timeit(fn, idx, rows)
            print(f"{name:24s} {ms:8.3f} ms   rel_err {err:.2e}", flush=True)
        except Exception as e:
            print(f"{name:24s} FAILED: {type(e).__name__}: {str(e)[:300]}",
                  flush=True)

    # 3D-class shape: S=2^19, R=16 (quad rows), B=2^18.
    B3, S3, R3 = 2**18, 2**19, 16
    idx3 = jnp.asarray(r.integers(0, S3, B3), jnp.int32)
    rows3 = jnp.asarray(r.normal(size=(B3, R3)).astype(np.float32))
    for name, fn in {
        "3d_xla_scatter": jax.jit(
            lambda i, v: jnp.zeros((S3, R3), jnp.float32)
            .at[i]
            .add(v, mode="promise_in_bounds")
        ),
        "3d_pallas_bf16": jax.jit(
            lambda i, v: scatter_rows_factored_pallas(i, v, S3, pair=False)
        ),
    }.items():
        try:
            ms = timeit(fn, idx3, rows3, n=10)
            print(f"{name:24s} {ms:8.3f} ms", flush=True)
        except Exception as e:
            print(f"{name:24s} FAILED: {type(e).__name__}: {str(e)[:300]}",
                  flush=True)


if __name__ == "__main__":
    main()
