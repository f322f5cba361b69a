#!/usr/bin/env python
"""Composed 3D NeRF-scale step with the CSR locked forward.

probe_3d_final: single/unpacked = 98.7 ms (best), with ~2.5-2.7 ms/level
of locked-forward gathers (11 levels). locked_fwd="csr" replaces those
gathers with bucket one-hot MXU matmuls on the backward's static-CSR
structure (see grid._quad_lookup_locked). This measures the composed
effect at the NeRF-scale protocol for single and pair rounding.

Run ON TPU: python -u benchmarks/probe_3d_csrfull.py > _probe3dcsr.txt 2>&1
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


def config(rounding):
    return {
        "loss": {"otype": "RelativeL2"},
        "optimizer": {"otype": "Adam", "learning_rate": 1e-2,
                      "beta2": 0.99, "epsilon": 1e-15, "l2_reg": 1e-6},
        "encoding": {
            "otype": "HashGrid", "n_levels": 16, "n_features_per_level": 2,
            "log2_hashmap_size": 19, "base_resolution": 16,
            "per_level_scale": 1.5, "hash": "CoherentAdditive",
            "gather_strategy": "stratified", "strata": 64,
            "phase_locked": True, "locked_phases": 1,
            "locked_rounding": rounding, "locked_fwd": "csr",
        },
        "network": {"otype": "FullyFusedMLP", "n_neurons": 64,
                    "n_hidden_layers": 2},
    }


def run(name, fn, *args, reps=10):
    t0 = time.time()
    try:
        c = jax.jit(fn).lower(*args).compile()
    except Exception as e:  # noqa: BLE001
        print(f"{name}: COMPILE FAILED: {str(e)[:200]}", flush=True)
        return
    print(f"{name}: compile {time.time()-t0:.0f}s", flush=True)
    out = c(*args)
    _ = float(jax.tree_util.tree_leaves(out)[0].ravel()[0])
    t0 = time.perf_counter()
    for _ in range(reps):
        out = c(*args)
    _ = float(jax.tree_util.tree_leaves(out)[0].ravel()[0])
    print(f"{name}: {(time.perf_counter()-t0)/reps*1e3:.1f} ms", flush=True)


def main():
    print("backend:", jax.default_backend(), flush=True)
    batch = 2**18
    x = stratified_uniform(jax.random.PRNGKey(0), batch, 3,
                           phase_locked=True)
    tgt = jax.random.uniform(jax.random.PRNGKey(1), (batch, 3))

    for rounding in ("single", "pair"):
        model = tc.create_from_config(3, 3, config(rounding), seed=1)
        trainer = model.trainer

        def step(state, xx, tt):
            return trainer._step_impl(state, xx, tt, None)

        run(f"{rounding}/csr full step", step, trainer.state, x, tgt)
    print("PROBE_DONE", flush=True)


if __name__ == "__main__":
    main()
