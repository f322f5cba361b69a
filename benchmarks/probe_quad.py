"""Measure the quad-row gather strategy on the flagship workload."""

import sys
import time
from pathlib import Path

import jax

jax.config.update("jax_compilation_cache_dir",
                  str(Path(__file__).resolve().parent.parent / ".jax_cache"))
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

import jax.numpy as jnp
import numpy as np

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

import tcnn_tpu as tc

CONFIG = {
    "loss": {"otype": "RelativeL2"},
    "optimizer": {"otype": "Adam", "learning_rate": 1e-2},
    "encoding": {
        "otype": "HashGrid",
        "n_levels": 16,
        "n_features_per_level": 2,
        "log2_hashmap_size": 19,
        "base_resolution": 16,
        "per_level_scale": 2.0,
        "hash": "CoherentAdditive",
        "gather_strategy": "quad",
    },
    "network": {
        "otype": "FullyFusedMLP",
        "activation": "ReLU",
        "output_activation": "None",
        "n_neurons": 64,
        "n_hidden_layers": 2,
    },
}

model = tc.create_from_config(2, 3, CONFIG)
trainer = model.trainer

r = np.random.default_rng(0)
batch = 2**18
xy = jnp.asarray(r.uniform(0, 1, (batch, 2)).astype(np.float32))
tgt = jnp.asarray(r.uniform(0, 1, (batch, 3)).astype(np.float32))

step = jax.jit(trainer._train_step)
t0 = time.time()
c = step.lower(trainer.state, xy, tgt).compile()
print("quad step compile", round(time.time() - t0, 1), flush=True)

st = trainer.state
st, loss = c(st, xy, tgt)
_ = float(loss)
t0 = time.time()
n = 20
for _ in range(n):
    st, loss = c(st, xy, tgt)
v = float(loss)
dt = (time.time() - t0) / n
print(f"quad train step: {dt*1e3:.2f} ms -> {batch/dt:.4g} samples/s "
      f"(loss {v:.3e})", flush=True)
