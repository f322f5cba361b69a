#!/usr/bin/env python
"""Serving-path decomposition (VERDICT r1 #4: >=1e8 samples/s target).

Times flagship inference at batch 2^18: full model vs encoding-only, with
and without the stratified static path, plus an amortized streaming loop.

Run ON TPU: python -u benchmarks/probe_serving.py > _probe_serving.txt 2>&1
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
from __graft_entry__ import FLAGSHIP_CONFIG  # noqa: E402
from tcnn_tpu.utils.sampling import stratified_uniform  # noqa: E402


def timeit(fn, *args, n=50):
    out = fn(*args)
    _ = float(jnp.sum(out[:4].astype(jnp.float32)))
    t0 = time.perf_counter()
    for _i in range(n):
        out = fn(*args)
    _ = float(jnp.sum(out[:4].astype(jnp.float32)))
    return (time.perf_counter() - t0) / n * 1e3


def main():
    print("backend:", jax.default_backend(), flush=True)
    batch = 2**18
    model = tc.create_from_config(2, 3, FLAGSHIP_CONFIG, seed=1)
    trainer = model.trainer
    enc = model.model.encoding
    net_params_n = model.model.network.n_params
    params = trainer.state["params"]
    x = stratified_uniform(jax.random.PRNGKey(0), batch, 2)

    variants = {}

    def full(p, xx, strat):
        out = model.model.apply(p, xx, stratified=strat)
        return out[:, :3].astype(jnp.float32)

    variants["full_quad"] = jax.jit(lambda p, xx: full(p, xx, False))
    variants["full_stratified"] = jax.jit(lambda p, xx: full(p, xx, None))

    def enc_only(p, xx, strat):
        return enc.apply(p[net_params_n:], xx, stratified=strat).astype(
            jnp.float32
        )

    variants["enc_quad"] = jax.jit(lambda p, xx: enc_only(p, xx, False))
    variants["enc_stratified"] = jax.jit(lambda p, xx: enc_only(p, xx, None))

    # MLP only (pre-encoded input).
    encoded = variants["enc_stratified"](params, x).astype(jnp.bfloat16)
    net = model.model.network
    variants_mlp = jax.jit(
        lambda p, e: net.apply(p[:net_params_n], e).astype(jnp.float32)
    )

    for name, fn in variants.items():
        ms = timeit(fn, params, x)
        print(f"{name:20s} {ms:7.3f} ms  ({batch/ms*1e3:.3e} samples/s)",
              flush=True)
    ms = timeit(variants_mlp, params, encoded)
    print(f"{'mlp_only':20s} {ms:7.3f} ms  ({batch/ms*1e3:.3e} samples/s)",
          flush=True)

    # Streaming: K batches queued before one sync (dispatch overlap).
    fn = variants["full_stratified"]
    xs = [
        stratified_uniform(jax.random.PRNGKey(i), batch, 2) for i in range(8)
    ]
    out = fn(params, xs[0])
    _ = float(jnp.sum(out[:4]))
    t0 = time.perf_counter()
    K = 64
    for i in range(K):
        out = fn(params, xs[i % 8])
    _ = float(jnp.sum(out[:4]))
    ms = (time.perf_counter() - t0) / K * 1e3
    print(f"{'streamed_stratified':20s} {ms:7.3f} ms  "
          f"({batch/ms*1e3:.3e} samples/s)", flush=True)


if __name__ == "__main__":
    main()
