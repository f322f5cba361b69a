#!/usr/bin/env python
"""Attribute the composed 3D phase-locked regression (151.7 vs 121.1 ms).

probe_r3b killed the "tiny-M bucket matmuls" hypothesis: at the REAL 3D
level shape (S=2^19, B=2^18, C=8, F=2; nb=512, M~590 — verified equal to
the composed config's per-level CSR shapes by offline dissection) the CSR
transpose standalone beats the hybrid emitter t_fn 3.35 vs 5.79 ms (pair)
and 2.42 (single), at every bucket width. So the composed regression must
come from one of the OTHER things the locked config changes:

  (a) gather_strategy "stratified" also moves coarse levels 0-5 onto the
      stratified static path (one-hot window upsampling) — measured only
      in 2D before; in 3D it has 2^3 corner shifts over a 64^3 tile grid;
  (b) the locked plumbing around the transpose (static-index forward,
      contract check, embedded CSR constants);
  (c) the CSR transpose composing badly (fusion interactions the
      standalone probe cannot see).

Five configs tease these apart; each measures the full train step and the
encoding-only backward:

  1. baseline     — auto quad/hybrid (the 121.1 ms incumbent)
  2. strat        — stratified, phase_locked=False: (a) alone
  3. lock-emitter — locked, diagnostic emitter transpose: (a) + (b)
  4. lock-pair    — the 151.7 ms config: (a) + (b) + (c)
  5. lock-single  — one bf16 CSR pass (reference half-grad_t regime)

Run ON TPU: python -u benchmarks/probe_3d_locked2.py > _probe3dl2.txt 2>&1
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


def config(strategy="stratified", locked=True, max_variants=None):
    enc = {
        "otype": "HashGrid", "n_levels": 16, "n_features_per_level": 2,
        "log2_hashmap_size": 19, "base_resolution": 16,
        "per_level_scale": 1.5, "hash": "CoherentAdditive",
    }
    if strategy == "stratified":
        enc.update({"gather_strategy": "stratified", "strata": 64})
        if max_variants is not None:
            # stratified_max_variants=1 => raster_max_scale=0: NO coarse
            # static path (coarse levels ride quad), fine levels still
            # lock — isolates the 3D one-hot window upsampling cost.
            enc["stratified_max_variants"] = max_variants
        if locked:
            # G=1: the exact config that measured 151.7 ms (the
            # regression under attribution here).
            enc.update({"phase_locked": True, "locked_phases": 1})
    else:
        # The 121.1 ms incumbent (probe_3d_decomp) is the QUAD strategy;
        # the first run of this probe omitted it and measured the
        # per-level-gather default at 664 ms — not the baseline.
        enc["gather_strategy"] = "quad"
    return {
        "loss": {"otype": "RelativeL2"},
        "optimizer": {"otype": "Adam", "learning_rate": 1e-2,
                      "beta2": 0.99, "epsilon": 1e-15, "l2_reg": 1e-6},
        "encoding": enc,
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

    cases = [
        ("baseline", config(strategy="auto")),
        ("strat", config(locked=False)),
        ("lock-emitter", config()),
        ("lock-pair", config()),
        ("lock-nocoarse", config(max_variants=1)),
        ("lock-single-nocoarse", config(max_variants=1)),
    ]
    rounding = {"lock-emitter": "emitter", "lock-pair": "pair",
                "lock-nocoarse": "pair", "lock-single-nocoarse": "single"}
    for name, cfg in cases:
        model = tc.create_from_config(3, 3, cfg, seed=1)
        trainer = model.trainer
        enc = model.model.encoding
        if name in rounding:
            enc.locked_rounding = rounding[name]
            print(f"[{name}] locked levels:",
                  sorted(enc._locked_levels(64)), flush=True)

        def step(state, xx, tt):
            return trainer._step_impl(state, xx, tt, None)

        run(f"{name} full step", step, trainer.state, x, tgt)

        n_net = model.model.network.n_params

        def enc_bwd(params, xx):
            pe = params[n_net:]
            return jax.grad(
                lambda q: (enc.apply(q, xx).astype(jnp.float32) ** 2).sum()
            )(pe).sum()

        run(f"{name} enc bwd", enc_bwd, trainer.state["params"], x)
    print("PROBE_DONE", flush=True)


if __name__ == "__main__":
    main()
