#!/usr/bin/env python
"""Dump the optimized HLO of the flagship train step so profiler op names
(copy.NNNN, dynamic-update-slice.NN, while.N ...) can be attributed to
source. Compile is served from .jax_cache when warm. Run ON TPU:
    python -u benchmarks/probe_2d_hlo_names.py > /tmp/hlo_2d.txt 2>&1
"""

import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

import jax

jax.config.update(
    "jax_compilation_cache_dir",
    str(Path(__file__).resolve().parent.parent / ".jax_cache"),
)
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

import jax.numpy as jnp  # noqa: E402

import tcnn_tpu as tc  # noqa: E402
from tcnn_tpu.utils.sampling import stratified_uniform  # noqa: E402


def main():
    batch = 2**18
    model = tc.create_from_config(2, 3, {
        "loss": {"otype": "RelativeL2"},
        "optimizer": {"otype": "Adam", "learning_rate": 1e-2, "beta1": 0.9,
                      "beta2": 0.99, "epsilon": 1e-15, "l2_reg": 1e-6},
        "encoding": {"otype": "HashGrid", "n_levels": 16,
                     "n_features_per_level": 2, "log2_hashmap_size": 15,
                     "base_resolution": 16, "per_level_scale": 1.5,
                     "hash": "CoherentAdditive",
                     "gather_strategy": "stratified"},
        "network": {"otype": "FullyFusedMLP", "n_neurons": 64,
                    "n_hidden_layers": 2},
    })
    trainer = model.trainer
    key = jax.random.PRNGKey(0)
    x = stratified_uniform(key, batch, 2)
    t = jnp.concatenate([x, (x[:, :1] + x[:, 1:]) / 2], axis=1)

    lowered = jax.jit(trainer._train_step, donate_argnums=(0,)).lower(
        trainer.state, x, t
    )
    compiled = lowered.compile()
    txt = compiled.as_text()
    print(txt)


if __name__ == "__main__":
    main()
