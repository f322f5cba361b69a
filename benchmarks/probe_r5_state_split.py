#!/usr/bin/env python
"""Round-5 probe: per-level grid params carried in the TRAINING STATE
(tuple of compact arrays as separate program inputs) vs the flat-vector
state (VERDICT r4 item 3).

Hypothesis: with per-level arrays as jit inputs, there is no in-graph
slice of a global params vector (the CSE'd two-layout (N, F) view) and
no gradient concatenation — each level's adjoint lands in its own
buffer, and the optimizer (elementwise) steps each leaf in place.

A: the standard Trainer step (flat state), timed exactly like bench.py.
B: split state {net, levels tuple, per-leaf optimizer states}; the
   optimizer is the same configured type instantiated per leaf (exact —
   all supported optimizers are elementwise with matrix/non-matrix
   behavior; grid params are non-matrix either way).

Usage: python benchmarks/probe_r5_state_split.py [--protocol 3d|2d]
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
    ap.add_argument("--protocol", choices=["2d", "3d"], default="3d")
    ap.add_argument("--steps", type=int, default=20)
    ap.add_argument("--blocks", type=int, default=5)
    ap.add_argument("--batch", type=int, default=2**18)
    args = ap.parse_args()

    import jax

    jax.config.update(
        "jax_compilation_cache_dir",
        str(Path(__file__).resolve().parent.parent / ".jax_cache"),
    )
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    import jax.numpy as jnp

    import tcnn_tpu as tc
    from tcnn_tpu.optimizers import create_optimizer
    from tcnn_tpu.utils.sampling import stratified_uniform

    n_dims = 2 if args.protocol == "2d" else 3
    adam = {
        "otype": "Adam", "learning_rate": 1e-2, "beta1": 0.9,
        "beta2": 0.99, "epsilon": 1e-15, "l2_reg": 1e-6,
    }
    opt_cfg = {"otype": "EMA", "decay": 0.99, "nested": adam}
    enc_cfg = {
        "otype": "HashGrid", "n_levels": 16, "n_features_per_level": 2,
        "log2_hashmap_size": 15 if n_dims == 2 else 19,
        "base_resolution": 16, "per_level_scale": 1.5,
        "hash": "CoherentAdditive", "gather_strategy": "stratified",
    }
    if n_dims == 3:
        enc_cfg.update(phase_locked=True, locked_rounding="single")
    else:
        enc_cfg.update(scatter_strategy="factored_sr")
    config = {
        "loss": {"otype": "RelativeL2"},
        "optimizer": opt_cfg,
        "encoding": enc_cfg,
        "network": {
            "otype": "FullyFusedMLP", "activation": "ReLU",
            "output_activation": "None", "n_neurons": 64,
            "n_hidden_layers": 2,
        },
    }
    model = tc.create_from_config(n_dims, 3, config)
    trainer = model.trainer
    enc = model.model.encoding
    net = model.model.network

    def make_batch(key):
        if n_dims == 3:
            x = stratified_uniform(key, args.batch, 3, phase_locked=1)
            t = jnp.stack(
                [
                    0.5 + 0.5 * jnp.sin(6 * jnp.pi * x[:, 0])
                    * jnp.cos(4 * jnp.pi * x[:, 1]),
                    0.5 + 0.5 * jnp.cos(5 * jnp.pi * (x[:, 1] + x[:, 2])),
                    0.5 + 0.5 * jnp.sin(3 * jnp.pi * x[:, 0] * x[:, 2] * 2),
                ],
                axis=-1,
            )
        else:
            x = stratified_uniform(key, args.batch, 2)
            t = jnp.stack(
                [x[:, 0], x[:, 1], 0.5 + 0.5 * jnp.sin(
                    8 * jnp.pi * x[:, 0] * x[:, 1])],
                axis=-1,
            )
        return jax.lax.optimization_barrier((x, t))

    # ---------------- A: flat state ----------------
    def step_a(state, key):
        x, t = make_batch(key)
        return trainer._step_impl(state, x, t, None)

    # ---------------- B: split state ----------------
    n_net = net.n_params
    flat0 = np.asarray(trainer.params)
    levels0 = tuple(
        jnp.asarray(a) for a in enc.split_params(flat0[n_net:])
    )
    opt_net = create_optimizer(opt_cfg)
    opt_net.allocate(n_net, model.model.layer_sizes())
    opt_lvls = []
    for a in levels0:
        o = create_optimizer(opt_cfg)
        o.allocate(int(a.shape[0]), [])
        opt_lvls.append(o)
    state_b = {
        "net": jnp.asarray(flat0[:n_net]),
        "levels": levels0,
        "opt_net": opt_net.init_state(),
        "opt_lvls": [o.init_state() for o in opt_lvls],
    }
    loss_obj = trainer.loss
    loss_scale = trainer.loss_scale

    def step_b(state, key):
        x, t = make_batch(key)

        def fwd(net_p, levels):
            return net.apply(net_p, enc.apply(levels, x))

        output, vjp = jax.vjp(fwd, state["net"], state["levels"])
        loss_sum, dL_dy = loss_obj.evaluate_sum_and_gradient(
            loss_scale, output, t, None
        )
        g_net, g_lvls = vjp(dL_dy)
        so_net, new_net = opt_net.step(
            state["opt_net"], state["net"], g_net, loss_scale
        )
        new_lvls, so_lvls = [], []
        for o, s, p, g in zip(
            opt_lvls, state["opt_lvls"], state["levels"], g_lvls
        ):
            s2, p2 = o.step(s, p, g, loss_scale)
            so_lvls.append(s2)
            new_lvls.append(p2)
        return (
            {
                "net": new_net,
                "levels": tuple(new_lvls),
                "opt_net": so_net,
                "opt_lvls": so_lvls,
            },
            loss_sum,
        )

    def run(step_fn, state, tag):
        jit_step = jax.jit(step_fn)
        keys = jax.random.split(
            jax.random.PRNGKey(0), args.steps * (args.blocks + 1)
        )
        ki = 0
        t_c0 = time.perf_counter()
        for _ in range(args.steps):  # warm block
            state, loss = jit_step(state, keys[ki]); ki += 1
        _ = float(loss)
        print(f"{tag}: warm block {time.perf_counter()-t_c0:.1f}s "
              f"loss={float(loss):.4e}", flush=True)
        ms = []
        for _ in range(args.blocks):
            t0 = time.perf_counter()
            for _ in range(args.steps):
                state, loss = jit_step(state, keys[ki]); ki += 1
            _ = float(loss)
            ms.append((time.perf_counter() - t0) / args.steps * 1e3)
        med = statistics.median(ms)
        print(f"{tag}: {med:.2f} ms/step blocks="
              f"{[round(m,2) for m in ms]} loss={float(loss):.4e}",
              flush=True)
        return med

    med_b = run(step_b, state_b, "B split-state")
    med_a = run(step_a, trainer.state, "A flat-state")
    print(f"RESULT protocol={args.protocol} flat={med_a:.2f} "
          f"split={med_b:.2f} ms/step", flush=True)


if __name__ == "__main__":
    main()
