#!/usr/bin/env python
"""Serving encoding-forward decomposition (VERDICT r1 #4 follow-up).

probe_serving.py showed flagship inference is encoding-bound (11.0 of
11.7 ms). This sweeps n_levels to attribute the cost (static coarse
levels 0-10 vs quad fine levels 11-15), and tries a bf16 table.

Run ON TPU: python -u benchmarks/probe_serving2.py > _probe_serving2.txt 2>&1
"""

import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

import jax

jax.config.update(
    "jax_compilation_cache_dir",
    str(Path(__file__).resolve().parent.parent / ".jax_cache"),
)
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

import jax.numpy as jnp  # noqa: E402
import numpy as np  # noqa: E402

import tcnn_tpu as tc  # noqa: E402
from tcnn_tpu.rng import PCG32  # noqa: E402
from tcnn_tpu.utils.sampling import stratified_uniform  # noqa: E402


def enc_config(n_levels):
    return {
        "otype": "HashGrid", "n_levels": n_levels,
        "n_features_per_level": 2, "log2_hashmap_size": 15,
        "base_resolution": 16, "per_level_scale": 1.5,
        "hash": "CoherentAdditive", "gather_strategy": "stratified",
    }


def timeit(fn, *args, reps=50):
    out = fn(*args)
    _ = float(jnp.sum(out[:2].astype(jnp.float32)))
    t0 = time.perf_counter()
    for _ in range(reps):
        out = fn(*args)
    _ = float(jnp.sum(out[:2].astype(jnp.float32)))
    return (time.perf_counter() - t0) / reps * 1e3


def main():
    print("backend:", jax.default_backend(), flush=True)
    batch = 2**18
    x = stratified_uniform(jax.random.PRNGKey(0), batch, 2)

    prev = 0.0
    for L in (4, 8, 11, 13, 16):
        enc = tc.create_encoding(2, enc_config(L))
        p = jnp.asarray(enc.initialize_params(PCG32(7)))
        fn = jax.jit(lambda p, x, e=enc: e.apply(p, x))
        ms = timeit(fn, p, x)
        print(f"L={L:2d}: {ms:7.3f} ms  (delta {ms-prev:+.3f})", flush=True)
        prev = ms

    # bf16 table (params cast once, resident) — serving-precision variant.
    enc = tc.create_encoding(2, enc_config(16))
    p = jnp.asarray(enc.initialize_params(PCG32(7)))
    p16 = p.astype(jnp.bfloat16)
    fn16 = jax.jit(lambda p, x, e=enc: e.apply(p, x))
    ms = timeit(fn16, p16, x)
    print(f"L=16 bf16 table: {ms:7.3f} ms", flush=True)

    # Quad fallback (arbitrary batches) for the same L=16 config.
    fnq = jax.jit(lambda p, x, e=enc: e.apply(p, x, stratified=False))
    ms = timeit(fnq, p, x)
    print(f"L=16 quad fallback: {ms:7.3f} ms", flush=True)


if __name__ == "__main__":
    main()
