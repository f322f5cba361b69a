#!/usr/bin/env python
"""Donation A/B on the locked 3D NeRF-scale step.

probe harnesses (and bench.py) wrap trainer._step_impl in a fresh
jax.jit WITHOUT donate_argnums, unlike the production
Trainer._jit_train_step (trainer.py:58, donate_argnums=(0,)).  The 3D
state is ~200 MB (13M params x [p, m, v] + EMA); without donation XLA
cannot alias state outputs onto inputs and the profile shows ~10 ms of
copies/relayouts (probe_3d_profile2: copy.1795 4.4ms + copy.1993-2025
~5ms).  Measures single-rounding locked step with and without donation.

Run ON TPU: python -u benchmarks/probe_3d_donate.py > _probe3ddon.txt 2>&1
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

import tcnn_tpu as tc  # noqa: E402
from tcnn_tpu.utils.sampling import stratified_uniform  # noqa: E402


def main():
    print("backend:", jax.default_backend(), flush=True)
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
            "locked_rounding": "single",
        },
        "network": {"otype": "FullyFusedMLP", "n_neurons": 64,
                    "n_hidden_layers": 2},
    }, seed=1)
    trainer = model.trainer

    def step(state, xx, tt):
        return trainer._step_impl(state, xx, tt, None)

    for name, kw in (("no-donate", {}), ("donate", {"donate_argnums": (0,)})):
        t0 = time.time()
        c = jax.jit(step, **kw).lower(trainer.state, x, tgt).compile()
        print(f"{name}: compile {time.time()-t0:.0f}s", flush=True)
        state = jax.tree_util.tree_map(jnp.copy, trainer.state)
        state, loss = c(state, x, tgt)
        _ = float(loss)
        t0 = time.perf_counter()
        for _ in range(10):
            state, loss = c(state, x, tgt)
        _ = float(loss)
        print(f"{name}: {(time.perf_counter()-t0)/10*1e3:.1f} ms",
              flush=True)
    print("PROBE_DONE", flush=True)


if __name__ == "__main__":
    main()
