#!/usr/bin/env python
"""Decompose the 3D NeRF-scale config's step time (VERDICT r1 #1).

Config: HashGrid 16x2 @ 2^19 scale 1.5 + FFMLP 64x2, batch 2^18 — the
reference's real use case (Instant-NGP NeRF scale). Round-1: 256 ms/step.

Run ON TPU: python -u benchmarks/probe_3d_decomp.py > _probe3d.txt 2>&1
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


def config(scatter="auto"):
    return {
        "loss": {"otype": "RelativeL2"},
        "optimizer": {"otype": "Adam", "learning_rate": 1e-2,
                      "beta2": 0.99, "epsilon": 1e-15, "l2_reg": 1e-6},
        "encoding": {
            "otype": "HashGrid", "n_levels": 16, "n_features_per_level": 2,
            "log2_hashmap_size": 19, "base_resolution": 16,
            "per_level_scale": 1.5, "hash": "CoherentAdditive",
            "gather_strategy": "quad", "scatter_strategy": scatter,
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
    batch = 2**18
    xyz = jnp.asarray(r.uniform(0, 1, (batch, 3)).astype(np.float32))
    tgt = jnp.asarray(r.uniform(0, 1, (batch, 3)).astype(np.float32))

    for scatter in ("auto",):
        model = tc.create_from_config(3, 3, config(scatter), seed=1)
        trainer = model.trainer

        def step(state, x, t):
            return trainer._step_impl(state, x, t, None)

        run(f"full_step[{scatter}]", step, trainer.state, xyz, tgt)

        if scatter == "auto":
            enc = model.model.encoding
            n_net = model.model.network.n_params

            def fwd_loss(params, x, t):
                out = model.model.apply(params, x)
                v, _ = trainer.loss.evaluate(1.0, out, t, None)
                return jnp.sum(v)

            run("fwd+loss[auto]", fwd_loss, trainer.state["params"], xyz, tgt)

            def enc_bwd(params, x):
                pe = params[n_net:]
                return jax.grad(
                    lambda p: (enc.apply(p, x).astype(jnp.float32) ** 2).sum()
                )(pe).sum()

            run("enc_bwd[auto]", enc_bwd, trainer.state["params"], xyz)


if __name__ == "__main__":
    main()
