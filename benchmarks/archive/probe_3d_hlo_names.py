#!/usr/bin/env python
"""Dump the optimized HLO of the LOCKED 3D NeRF-scale train step so the
probe_3d_profile2 op names (reshape.39 @9.8ms, pad_add_fusion @5.1ms,
copy.1795 @4.4ms, fusion.4-15 @1.2ms each, ...) can be attributed to
source metadata. Must match probe_3d_profile2's graph exactly
(_step_impl, NO donation, pair rounding) — compile comes from
.jax_cache. Run ON TPU:
    python -u benchmarks/probe_3d_hlo_names.py > /tmp/hlo_3d.txt 2>&1
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
    x = stratified_uniform(jax.random.PRNGKey(0), batch, 3,
                           phase_locked=True)
    tgt = jax.random.uniform(jax.random.PRNGKey(1), (batch, 3))
    model = tc.create_from_config(3, 3, {
        "loss": {"otype": "RelativeL2"},
        "optimizer": {"otype": "Adam", "learning_rate": 1e-2,
                      "beta2": 0.99, "epsilon": 1e-15, "l2_reg": 1e-6},
        "encoding": {
            "otype": "HashGrid", "n_levels": 16, "n_features_per_level": 2,
            "log2_hashmap_size": 19, "base_resolution": 16,
            "per_level_scale": 1.5, "hash": "CoherentAdditive",
            "gather_strategy": "stratified", "strata": 64,
            "phase_locked": True, "locked_phases": 1,
            "locked_rounding": "pair",
        },
        "network": {"otype": "FullyFusedMLP", "n_neurons": 64,
                    "n_hidden_layers": 2},
    }, seed=1)
    trainer = model.trainer

    def step(state, xx, tt):
        return trainer._step_impl(state, xx, tt, None)

    compiled = jax.jit(step).lower(trainer.state, x, tgt).compile()
    print(compiled.as_text())


if __name__ == "__main__":
    main()
