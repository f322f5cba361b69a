#!/usr/bin/env python
"""3D NeRF-scale config with the PHASE-LOCKED static-index fine levels.

Same protocol as probe_3d_decomp.py (HashGrid 16x2 @ 2^19 scale 1.5 +
FFMLP 64x2, batch 2^18 = 64^3) but with gather_strategy "stratified",
strata 64, phase_locked=True and phase-locked batches: the 10+ fine
levels' scatter emitters (~5.7 ms/level) become static-CSR bucket
matmuls (~2.7 ms standalone, probe_r3_static). Baseline to beat: 121.1
ms/step (auto quad path, 2026-08-18).

Run ON TPU: python -u benchmarks/probe_3d_locked.py > _probe3dl.txt 2>&1
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


def config(rounding="pair"):
    return {
        "loss": {"otype": "RelativeL2"},
        "optimizer": {"otype": "Adam", "learning_rate": 1e-2,
                      "beta2": 0.99, "epsilon": 1e-15, "l2_reg": 1e-6},
        "encoding": {
            "otype": "HashGrid", "n_levels": 16, "n_features_per_level": 2,
            "log2_hashmap_size": 19, "base_resolution": 16,
            "per_level_scale": 1.5, "hash": "CoherentAdditive",
            "gather_strategy": "stratified", "strata": 64,
            "phase_locked": True, "locked_rounding": rounding,
            "locked_phases": 1,
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
    batch = 2**18
    key = jax.random.PRNGKey(0)
    xyz = stratified_uniform(key, batch, 3, phase_locked=True)
    tgt = jax.random.uniform(jax.random.PRNGKey(1), (batch, 3))

    for rounding in ("pair", "sr"):
        model = tc.create_from_config(3, 3, config(rounding), seed=1)
        trainer = model.trainer
        enc = model.model.encoding
        print(f"[{rounding}] locked levels:",
              sorted(enc._locked_levels(64)), flush=True)

        def step(state, x, t):
            return trainer._step_impl(state, x, t, None)

        # sanity: locked output is finite (contract satisfied)
        y = enc.apply(trainer.state["params"][model.model.network.n_params:],
                      xyz[:64**3])
        print(f"[{rounding}] enc finite:", bool(jnp.isfinite(y).all()),
              flush=True)

        run(f"full_step[{rounding}]", step, trainer.state, xyz, tgt)

        if rounding == "pair":
            n_net = model.model.network.n_params

            def fwd_loss(params, x, t):
                out = model.model.apply(params, x)
                v, _ = trainer.loss.evaluate(1.0, out, t, None)
                return jnp.sum(v)

            run("fwd+loss[pair]", fwd_loss, trainer.state["params"], xyz,
                tgt)

            def enc_bwd(params, x):
                pe = params[n_net:]
                return jax.grad(
                    lambda p: (enc.apply(p, x).astype(jnp.float32) ** 2).sum()
                )(pe).sum()

            run("enc_bwd[pair]", enc_bwd, trainer.state["params"], xyz)
    print("PROBE_DONE", flush=True)


if __name__ == "__main__":
    main()
