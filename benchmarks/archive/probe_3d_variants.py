#!/usr/bin/env python
"""3D locked config: re-admit the static coarse path with SMALL windows.

The +50 ms 3D stratified regression (probe_3d_locked2) was measured with
the then-default stratified_max_variants=3, whose raster_max_scale=128
put levels up to scale 128 (129^3-vertex dense grids!) on the one-hot
window upsampling — 27 window shifts over the 64^3 tile grid each.
variants=1 (the current 3D default) disables the static path entirely,
leaving coarse levels 0-4 on the quad path (~35 ms of the 98.7 ms step:
fwd gathers + factored/emitter scatters).

Never measured: variants=2 -> raster_max_scale=64 -> ONLY levels with
scale <= 64 (l0-l3: 15/23/35/53, grids <= 55^3) go static with 2^3=8
window shifts each. Small dense grids + 8 shifts may beat those levels'
~2.5 ms gathers + 0.5-6 ms scatters.

Cases (full composed train step, locked single rounding — current best
98.7 ms):
  v1: variants=1 (baseline)
  v2: variants=2

Run ON TPU: python -u benchmarks/probe_3d_variants.py > _probe3dv.txt 2>&1
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


def config(variants):
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
            "locked_rounding": "single",
            "stratified_max_variants": variants,
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

    for variants in (1, 2):
        model = tc.create_from_config(3, 3, config(variants), seed=1)
        trainer = model.trainer
        enc = model.model.encoding
        print(f"[v{variants}] locked:", sorted(enc._locked_levels(64)),
              "raster_max_scale:", enc.raster_max_scale, flush=True)

        def step(state, xx, tt):
            return trainer._step_impl(state, xx, tt, None)

        run(f"v{variants} full step", step, trainer.state, x, tgt)
    print("PROBE_DONE", flush=True)


if __name__ == "__main__":
    main()
