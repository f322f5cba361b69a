#!/usr/bin/env python
"""2D flagship fine levels: factored MXU scatter vs lane-packed xla_half.

The packed quad path (grid.py quad_pack) engages only for xla-family
scatter modes; 2D flagship fine levels (2^15 rows) currently use the
factored MXU scatter. This measures whether packed+xla_half beats
factored at those shapes — if yes, the auto gate should change.

Run ON TPU: python -u benchmarks/probe_2d_packed.py > _probe2d_packed.txt 2>&1
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


def enc_config(scatter):
    return {
        "otype": "HashGrid", "n_levels": 16, "n_features_per_level": 2,
        "log2_hashmap_size": 15, "base_resolution": 16,
        "per_level_scale": 1.5, "hash": "CoherentAdditive",
        "gather_strategy": "stratified", "scatter_strategy": scatter,
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


def main():
    print("backend:", jax.default_backend(), flush=True)
    batch = 2**18
    x = stratified_uniform(jax.random.PRNGKey(0), batch, dims=2)

    for scatter in ("auto", "xla_half"):
        e = tc.create_encoding(2, enc_config(scatter))
        params = jnp.asarray(e.initialize_params(PCG32(7)))

        def enc_bwd(p, x, e=e):
            return jax.grad(
                lambda q: (e.apply(q, x).astype(jnp.float32) ** 2).sum()
            )(p).sum()

        def enc_fwd(p, x, e=e):
            return e.apply(p, x).astype(jnp.float32).sum()

        run(f"enc_fwd[{scatter}]", enc_fwd, params, x)
        run(f"enc_bwd[{scatter}]", enc_bwd, params, x)


if __name__ == "__main__":
    main()
