"""Probe: composed train-step time per gather strategy at a given config.

Usage: probe_strategies.py [log2_hashmap] [per_level_scale] [strategies...]
"""

import sys as _sys
from pathlib import Path as _P
_sys.path.insert(0, str(_P(__file__).resolve().parent.parent))

import sys
import time

import jax

jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

import jax.numpy as jnp
import numpy as np

import tcnn_tpu as tc

log2_hashmap = int(sys.argv[1]) if len(sys.argv) > 1 else 15
scale = float(sys.argv[2]) if len(sys.argv) > 2 else 1.5
strategies = sys.argv[3:] or ["quad", "quad_fused"]

r = np.random.default_rng(0)
batch = 2**18
xy = jnp.asarray(r.uniform(0, 1, (batch, 2)).astype(np.float32))
tgt = jnp.asarray(r.uniform(0, 1, (batch, 3)).astype(np.float32))

for gs in strategies:
    config = {
        "loss": {"otype": "RelativeL2"},
        "optimizer": {
            "otype": "Adam", "learning_rate": 1e-2, "beta1": 0.9,
            "beta2": 0.99, "epsilon": 1e-15, "l2_reg": 1e-6,
        },
        "encoding": {
            "otype": "HashGrid", "n_levels": 16, "n_features_per_level": 2,
            "log2_hashmap_size": log2_hashmap, "base_resolution": 16,
            "per_level_scale": scale, "hash": "CoherentAdditive",
            "gather_strategy": gs,
        },
        "network": {
            "otype": "FullyFusedMLP", "activation": "ReLU",
            "output_activation": "None", "n_neurons": 64,
            "n_hidden_layers": 2,
        },
    }
    model = tc.create_from_config(2, 3, config)
    trainer = model.trainer

    def step(state, x, t):
        return trainer._step_impl(state, x, t, None)

    t0 = time.time()
    c = jax.jit(step).lower(trainer.state, xy, tgt).compile()
    ct = time.time() - t0
    state = trainer.state
    state, loss = c(state, xy, tgt)
    _ = float(loss)
    t0 = time.time()
    reps = 20
    for _i in range(reps):
        state, loss = c(state, xy, tgt)
    _ = float(loss)
    ms = (time.time() - t0) / reps * 1e3
    print(f"{gs:12s}: {ms:7.1f} ms/step (compile {ct:.0f}s) loss={float(loss):.3e}",
          flush=True)
