#!/usr/bin/env python
"""Hybrid quad lookup (unpacked-gather fwd / packed-scatter bwd) A/B.

Measures the 3D NeRF-scale config (16x2 @ 2^19 + FFMLP 64x2, B=2^18) and
the oversized 2D config full train steps with quad_pack in
{auto (packed), hybrid}, plus encoding fwd/bwd isolation.

Run ON TPU: python -u benchmarks/probe_hybrid.py > _probe_hybrid.txt 2>&1
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


def config(dims, quad_pack):
    return {
        "loss": {"otype": "RelativeL2"},
        "optimizer": {"otype": "Adam", "learning_rate": 1e-2,
                      "beta2": 0.99, "epsilon": 1e-15, "l2_reg": 1e-6},
        "encoding": {
            "otype": "HashGrid", "n_levels": 16, "n_features_per_level": 2,
            "log2_hashmap_size": 19, "base_resolution": 16,
            "per_level_scale": 1.5, "hash": "CoherentAdditive",
            "gather_strategy": "quad", "scatter_strategy": "auto",
            "quad_pack": quad_pack,
        },
        "network": {"otype": "FullyFusedMLP", "n_neurons": 64,
                    "n_hidden_layers": 2},
    }


def run(name, fn, *args, reps=10):
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
    print(f"{name}: {ms:7.2f} ms  (compile {compile_s:.0f}s)", flush=True)


def main():
    print("backend:", jax.default_backend(), flush=True)
    r = np.random.default_rng(0)
    batch = 2**18

    for dims in (3, 2):
        x = jnp.asarray(r.uniform(0, 1, (batch, dims)).astype(np.float32))
        tgt = jnp.asarray(r.uniform(0, 1, (batch, 3)).astype(np.float32))
        for qp in ("auto", "hybrid"):
            model = tc.create_from_config(dims, 3, config(dims, qp), seed=1)
            trainer = model.trainer

            def step(state, x, t):
                return trainer._step_impl(state, x, t, None)

            run(f"{dims}D full_step[{qp}]", step, trainer.state, x, tgt)

            enc = model.model.encoding
            n_net = model.model.network.n_params
            pe = trainer.state["params"][n_net:]

            def enc_fwd(p, x):
                return enc.apply(p, x).astype(jnp.float32).sum()

            def enc_bwd(p, x):
                return jax.grad(
                    lambda q: (enc.apply(q, x).astype(jnp.float32) ** 2).sum()
                )(p).sum()

            run(f"{dims}D enc_fwd[{qp}]", enc_fwd, pe, x)
            run(f"{dims}D enc_bwd[{qp}]", enc_bwd, pe, x)


if __name__ == "__main__":
    main()
