#!/usr/bin/env python
"""2D flagship step decomposition, round 2: where do the 28 ms go?

Sweeps encoding-only fwd / fwd+bwd over level counts (9 = static coarse
only; 16 = full) and scatter modes ("drop" isolates scatter share), plus
the full composed train step. All at B=2^18 stratified.

Run ON TPU: python -u benchmarks/probe_2d_decomp.py > _probe2d_decomp.txt 2>&1
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
from __graft_entry__ import FLAGSHIP_CONFIG  # noqa: E402


def enc_config(n_levels, scatter="auto", gather="stratified"):
    return {
        "otype": "HashGrid", "n_levels": n_levels,
        "n_features_per_level": 2, "log2_hashmap_size": 15,
        "base_resolution": 16, "per_level_scale": 1.5,
        "hash": "CoherentAdditive",
        "gather_strategy": gather, "scatter_strategy": scatter,
    }


def run(name, fn, *args, reps=15):
    t0 = time.time()
    c = jax.jit(fn).lower(*args).compile()
    compile_s = time.time() - t0
    out = c(*args)
    _ = float(jax.tree_util.tree_leaves(out)[0].ravel()[0])
    t0 = time.perf_counter()
    for _i in range(reps):
        out = c(*args)
    _ = float(jax.tree_util.tree_leaves(out)[0].ravel()[0])
    ms = (time.perf_counter() - t0) / reps * 1e3
    print(f"{name}: {ms:7.3f} ms  (compile {compile_s:.0f}s)", flush=True)


def bench_enc(tag, cfg, x):
    e = tc.create_encoding(2, cfg)
    params = jnp.asarray(e.initialize_params(PCG32(7)))

    def enc_fwd(p, x):
        return e.apply(p, x).astype(jnp.float32).sum()

    def enc_bwd(p, x):
        return jax.grad(
            lambda q: (e.apply(q, x).astype(jnp.float32) ** 2).sum()
        )(p).sum()

    run(f"enc_fwd[{tag}]", enc_fwd, params, x)
    run(f"enc_bwd[{tag}]", enc_bwd, params, x)


def main():
    print("backend:", jax.default_backend(), flush=True)
    batch = 2**18
    x = stratified_uniform(jax.random.PRNGKey(0), batch, dims=2)

    # full composed step (the bench number)
    model = tc.create_from_config(2, 3, FLAGSHIP_CONFIG)
    r = np.random.default_rng(0)
    tgt = jnp.asarray(r.uniform(0, 1, (batch, 3)).astype(np.float32))

    def step(state, x, tgt):
        return model.trainer._train_step(state, x, tgt)

    run("full train step", step, model.trainer.state, x, tgt)

    def fwd_loss(params, x, tgt):
        y = model.model.apply(params, x)
        return ((y[:, :3].astype(jnp.float32) - tgt) ** 2).sum()

    run("model fwd+loss", fwd_loss, model.trainer.state["params"], x, tgt)

    bench_enc("L16 auto", enc_config(16), x)
    bench_enc("L9 static-only", enc_config(9), x)
    bench_enc("L13 auto", enc_config(13), x)
    bench_enc("L16 drop", enc_config(16, scatter="drop"), x)
    bench_enc("L16 quad (no static)", enc_config(16, gather="quad"), x)


if __name__ == "__main__":
    main()
