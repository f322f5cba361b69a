#!/usr/bin/env python
"""table_dtype A/B on the 3D NeRF-scale config: f32 vs f16 vs bf16 tables.

The forward quad gathers fetch (B, 16)-row cells from materialized
(S, 16) quad tables; halving the storage dtype halves both the table
build traffic and the gathered bytes. The scatter emitter's cost was
measured per-ROW, not per-byte (PLAN.md) — this probes whether the
gather/build side is byte-bound enough to win composed.

Run ON TPU: python -u benchmarks/probe_tdtype.py > _probe_tdtype.txt 2>&1
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

B = 2**18


def config(tdtype):
    return {
        "loss": {"otype": "RelativeL2"},
        "optimizer": {"otype": "Adam", "learning_rate": 1e-2,
                      "beta2": 0.99, "epsilon": 1e-15, "l2_reg": 1e-6},
        "encoding": {
            "otype": "HashGrid", "n_levels": 16, "n_features_per_level": 2,
            "log2_hashmap_size": 19, "base_resolution": 16,
            "per_level_scale": 1.5, "hash": "CoherentAdditive",
            "gather_strategy": "quad", "table_dtype": tdtype,
        },
        "network": {"otype": "FullyFusedMLP", "n_neurons": 64,
                    "n_hidden_layers": 2},
    }


def run(name, fn, *args, reps=10):
    t0 = time.time()
    c = jax.jit(fn).lower(*args).compile()
    print(f"{name}: compile {time.time()-t0:.0f}s", flush=True)
    out = c(*args)
    _ = float(jax.tree_util.tree_leaves(out)[0].ravel()[0])
    t0 = time.perf_counter()
    for _i in range(reps):
        out = c(*args)
    _ = float(jax.tree_util.tree_leaves(out)[0].ravel()[0])
    print(f"{name}: {(time.perf_counter()-t0)/reps*1e3:.1f} ms", flush=True)


def main():
    print("backend:", jax.default_backend(), flush=True)
    r = np.random.default_rng(0)
    x = jnp.asarray(r.uniform(0, 1, (B, 3)).astype(np.float32))
    y = jnp.asarray(r.uniform(0, 1, (B, 3)).astype(np.float32))

    for tdtype in ("float32", "float16", "bfloat16"):
        model = tc.create_from_config(3, 3, config(tdtype))
        tr = model.trainer
        st = tr.state

        def step(state, xx, yy):
            return tr._train_step(state, xx, yy)

        run(f"full step [{tdtype}]", step, st, x, y)

        enc = model.model.encoding
        eparams = jnp.asarray(
            r.standard_normal(enc.n_params).astype(np.float32) * 0.1
        )

        def enc_fwd(p, xx):
            return enc.apply(p, xx).astype(jnp.float32).sum().reshape(1)

        def enc_bwd(p, xx):
            return jax.grad(lambda q: enc_fwd(q, xx)[0])(p)

        run(f"enc fwd  [{tdtype}]", enc_fwd, eparams, x)
        run(f"enc bwd  [{tdtype}]", enc_bwd, eparams, x)


if __name__ == "__main__":
    main()
