#!/usr/bin/env python
"""Round-5 probe: execution-strategy A/B on the REFERENCE-VERBATIM config
(data/config_hash.json semantics: CoherentPrime hash, iid uniform batches,
no EMA — VERDICT r4 item 4: make the drop-in default fast).

The verbatim bench measured 162.3 ms/step with the package defaults
(gather per_level, scatter auto). Candidate improvements that keep
REFERENCE-EXACT semantics (same hash, same geometry, same features):

  A per_level   — the current default (baseline)
  B quad        — quad-table gather for the affine (dense/tiled raster)
                  levels; XOR-hashed fines keep per-corner gathers
  C quad_fused  — supertable single-gather variant
  D B + xla_half scatter forced (vs auto)

Each runs the bench.py 2D protocol batch/step shape: B=2^18, 20-step
blocks, median of 5.

Usage: python benchmarks/probe_r5_verbatim_ab.py [--only A,B,...]
"""

import argparse
import statistics
import sys
import time
from pathlib import Path

import numpy as np

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--steps", type=int, default=20)
    ap.add_argument("--blocks", type=int, default=5)
    ap.add_argument("--batch", type=int, default=2**18)
    ap.add_argument("--only", default=None)
    args = ap.parse_args()

    import jax

    jax.config.update(
        "jax_compilation_cache_dir",
        str(Path(__file__).resolve().parent.parent / ".jax_cache"),
    )
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    import jax.numpy as jnp

    import tcnn_tpu as tc

    def build(enc_extra):
        return tc.create_from_config(2, 3, {
            "loss": {"otype": "RelativeL2"},
            "optimizer": {
                "otype": "Adam", "learning_rate": 1e-2, "beta1": 0.9,
                "beta2": 0.99, "epsilon": 1e-15, "l2_reg": 1e-6,
            },
            "encoding": {
                "otype": "HashGrid", "n_levels": 16,
                "n_features_per_level": 2, "log2_hashmap_size": 15,
                "base_resolution": 16, "per_level_scale": 1.5,
                **enc_extra,
            },
            "network": {
                "otype": "FullyFusedMLP", "activation": "ReLU",
                "output_activation": "None", "n_neurons": 64,
                "n_hidden_layers": 2,
            },
        })

    def run(tag, enc_extra):
        model = build(enc_extra)
        trainer = model.trainer
        step = jax.jit(trainer._train_step, donate_argnums=(0,))

        def make_batch(key):
            k1, k2 = jax.random.split(key)
            x = jax.random.uniform(k1, (args.batch, 2), jnp.float32)
            t = jnp.stack(
                [x[:, 0], x[:, 1],
                 0.5 + 0.5 * jnp.sin(8 * jnp.pi * x[:, 0] * x[:, 1])],
                axis=-1,
            )
            return x, t

        keys = jax.random.split(
            jax.random.PRNGKey(0), args.steps * (args.blocks + 1)
        )
        batches = None  # regenerate per step on device inside jit? keep
        # parity with bench.py: batch generation on device, outside timing
        state = trainer.state
        ki = 0
        t0 = time.perf_counter()
        for _ in range(args.steps):
            x, t = make_batch(keys[ki]); ki += 1
            state, loss = step(state, x, t)
        _ = float(loss)
        print(f"{tag}: warm {time.perf_counter()-t0:.1f}s "
              f"loss={float(loss):.4e}", flush=True)
        ms = []
        for _ in range(args.blocks):
            t0 = time.perf_counter()
            for _ in range(args.steps):
                x, t = make_batch(keys[ki]); ki += 1
                state, loss = step(state, x, t)
            _ = float(loss)
            ms.append((time.perf_counter() - t0) / args.steps * 1e3)
        med = statistics.median(ms)
        print(f"{tag}: {med:.2f} ms/step blocks="
              f"{[round(m, 2) for m in ms]} loss={float(loss):.4e}",
              flush=True)
        return med

    cases = {
        "A": ("A per_level (default)", {}),
        "B": ("B quad", {"gather_strategy": "quad"}),
        "C": ("C quad_fused", {"gather_strategy": "quad_fused"}),
        "D": ("D quad+xla_half", {"gather_strategy": "quad",
                                  "scatter_strategy": "xla_half"}),
        # The auto-select candidates (hash unspecified in the reference
        # config -> the package may choose): additive hash unlocks the
        # quad-row corner trick on every hashed level.
        "E": ("E additive+quad", {"hash": "CoherentAdditive",
                                  "gather_strategy": "quad"}),
        "F": ("F additive+quad_fused", {"hash": "CoherentAdditive",
                                        "gather_strategy": "quad_fused"}),
        "G": ("G additive+per_level", {"hash": "CoherentAdditive"}),
        # SR scatter: same precision class as the reference's own
        # half-atomic scatter (grid.h:660-671) — one matmul instead of
        # the compensated pair.
        "H": ("H quad+factored_sr", {"gather_strategy": "quad",
                                     "scatter_strategy": "factored_sr"}),
        "I": ("I additive+quad+factored_sr",
              {"hash": "CoherentAdditive", "gather_strategy": "quad",
               "scatter_strategy": "factored_sr"}),
        # The compensated pair as ONE matmul (bitwise-equal to the
        # default pair; strips concatenated along lanes).
        "J": ("J additive+quad+factored_fused",
              {"hash": "CoherentAdditive", "gather_strategy": "quad",
               "scatter_strategy": "factored_fused"}),
    }
    want = set(args.only.split(",")) if args.only else None
    for k, (tag, extra) in cases.items():
        if want is None or k in want:
            run(tag, extra)
    print("done", flush=True)


if __name__ == "__main__":
    main()
