#!/usr/bin/env python
"""Final 3D NeRF-scale matrix under the round-3 defaults.

probe_3d_locked2 attribution: the 3D stratified regression was the
coarse static path (+50 ms; now default-off in 3D via
stratified_max_variants=1), and the locked CSR transpose saves ~20 ms
vs the emitter within the stratified config. This probe measures the
surviving matrix at the 3D NeRF-scale protocol (16x2 @ 2^19 + FFMLP
64x2, B=2^18): locked_rounding {pair, single} x locked_fwd
{unpacked, packed}. Baseline to beat: 122.1 ms (quad hybrid).

Run ON TPU: python -u benchmarks/probe_3d_final.py > _probe3df.txt 2>&1
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
from tcnn_tpu.utils.sampling import stratified_uniform  # noqa: E402


def config(rounding, fwd):
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
            "locked_rounding": rounding, "locked_fwd": fwd,
        },
        "network": {"otype": "FullyFusedMLP", "n_neurons": 64,
                    "n_hidden_layers": 2},
    }


def run(name, fn, *args, reps=10):
    t0 = time.time()
    try:
        c = jax.jit(fn).lower(*args).compile()
    except Exception as e:  # noqa: BLE001
        print(f"{name}: COMPILE FAILED: {str(e)[:160]}", flush=True)
        return
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
    batch = 2**18
    x = stratified_uniform(jax.random.PRNGKey(0), batch, 3,
                           phase_locked=True)
    tgt = jax.random.uniform(jax.random.PRNGKey(1), (batch, 3))

    combos = [
        (r, f)
        for r in ("pair", "single")
        for f in ("unpacked", "packed")
    ]
    if len(sys.argv) > 1:  # e.g. "pair/unpacked single/unpacked"
        combos = [tuple(a.split("/")) for a in sys.argv[1:]]
    for rounding, fwd in combos:
        if True:
            model = tc.create_from_config(
                3, 3, config(rounding, fwd), seed=1
            )
            trainer = model.trainer
            enc = model.model.encoding
            print(f"[{rounding}/{fwd}] locked:",
                  sorted(enc._locked_levels(64)),
                  "variants:", enc.stratified_max_variants, flush=True)

            def step(state, xx, tt):
                return trainer._step_impl(state, xx, tt, None)

            run(f"{rounding}/{fwd} full step", step, trainer.state, x, tgt)
    print("PROBE_DONE", flush=True)


if __name__ == "__main__":
    main()
