#!/usr/bin/env python
"""SDF-learning sample: fit a signed distance field with an eikonal prior.

The third marquee application of the reference's model family (alongside
image fit and NeRF — instant-ngp's SDF mode drives the same
HashGrid + tiny-MLP through tiny-cuda-nn; the reference's own second-order
machinery exists for exactly this: grid.h:910-1042
``backward_backward_input`` + scripts/test_grid_bwdbwd.py:119-193).

Learns f(x) ~ sdf(x) for an analytic target (sphere/torus/union) over
[0,1]^3 from sampled distances, regularized by the eikonal residual
(|grad f| - 1)^2 — a SECOND-ORDER objective: training differentiates
through grad_x f, which tcnn_tpu supports on every execution path
(quad/stratified gathers, factored scatters, FFMLP kernel falls back to
the XLA chain under higher-order tracing — tests/test_second_order.py).

Usage:
    python samples/sdf_learning.py [n_steps] [batch]
"""

from __future__ import annotations

import sys
import time
from pathlib import Path

import numpy as np

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

CONFIG = {
    "loss": {"otype": "L2"},  # distance supervision term (manual total loss)
    "optimizer": {
        "otype": "Adam",
        "learning_rate": 1e-3,
        "beta1": 0.9,
        "beta2": 0.99,
        "epsilon": 1e-15,
    },
    "encoding": {
        "otype": "HashGrid",
        "n_levels": 8,
        "n_features_per_level": 2,
        "log2_hashmap_size": 15,
        "base_resolution": 8,
        "per_level_scale": 1.6,
        # Smoothstep makes the interpolant C1 — a continuous spatial
        # gradient for the eikonal term (the reference ships the same knob
        # for the same reason, grid.h InterpolationType::Smoothstep).
        "interpolation": "Smoothstep",
        "hash": "CoherentAdditive",
        "gather_strategy": "quad",
    },
    "network": {
        "otype": "CutlassMLP",
        "activation": "ReLU",
        "output_activation": "None",
        "n_neurons": 64,
        "n_hidden_layers": 2,
    },
}


def target_sdf(x):
    """Union of a sphere and a torus, both well inside [0,1]^3."""
    import jax.numpy as jnp

    p = x - 0.5
    sphere = jnp.linalg.norm(p - jnp.asarray([0.15, 0.0, 0.0]), axis=-1) - 0.18
    q = p + jnp.asarray([0.15, 0.0, 0.0])
    ring = jnp.sqrt(q[..., 0] ** 2 + q[..., 1] ** 2) - 0.2
    torus = jnp.sqrt(ring**2 + q[..., 2] ** 2) - 0.07
    return jnp.minimum(sphere, torus)


def fit(n_steps: int = 200, batch: int = 8192, eikonal_weight: float = 0.01,
        seed: int = 0, log_every: int = 50):
    import jax
    import jax.numpy as jnp

    import tcnn_tpu as tc

    model = tc.create_from_config(3, 1, CONFIG)
    net = model.model  # NetworkWithInputEncoding

    # Custom objective (distance L2 + eikonal), so drive the params/opt
    # state directly through the trainer's optimizer like an advanced user
    # would: pure jitted step over the trainer's state pytree.
    trainer = model.trainer

    def total_loss(params, x, d_true):
        d_pred = net.apply(params, x)[:, 0].astype(jnp.float32)
        data = jnp.mean((d_pred - d_true) ** 2)

        def f_scalar(pt):
            return net.apply(params, pt[None, :])[0, 0].astype(jnp.float32)

        grads = jax.vmap(jax.grad(f_scalar))(x)  # (B, 3) spatial gradient
        eik = jnp.mean((jnp.linalg.norm(grads, axis=-1) - 1.0) ** 2)
        return data + eikonal_weight * eik, (data, eik)

    opt = trainer.optimizer

    @jax.jit
    def step(state, key):
        kx, key = jax.random.split(key)
        x = jax.random.uniform(kx, (batch, 3), jnp.float32)
        d_true = target_sdf(x)
        (loss, (data, eik)), g = jax.value_and_grad(
            total_loss, has_aux=True
        )(state["params"], x, d_true)
        new_opt, new_params = opt.step(state["opt"], state["params"], g, 1.0)
        return (
            {**state, "params": new_params, "opt": new_opt},
            (loss, data, eik),
            key,
        )

    state = dict(trainer.state)
    key = jax.random.PRNGKey(seed)
    history = []
    t0 = time.time()
    for i in range(n_steps):
        state, (loss, data, eik), key = step(state, key)
        if (i + 1) % log_every == 0 or i == 0:
            loss_f = float(loss)
            history.append(loss_f)
            print(
                f"step {i + 1:5d}  loss {loss_f:.5f}  "
                f"sdf-l2 {float(data):.5f}  eikonal {float(eik):.5f}",
                flush=True,
            )
    dt = time.time() - t0

    # Validation: distance MAE on fresh points + eikonal residual.
    kx = jax.random.PRNGKey(seed + 1)
    xv = jax.random.uniform(kx, (4096, 3), jnp.float32)
    _, (data_v, eik_v) = total_loss(state["params"], xv, target_sdf(xv))
    print(
        f"done in {dt:.1f}s: validation sdf-l2 {float(data_v):.6f}, "
        f"eikonal residual {float(eik_v):.5f}",
        flush=True,
    )
    return float(data_v), float(eik_v), history


def main():
    n_steps = int(sys.argv[1]) if len(sys.argv) > 1 else 200
    batch = int(sys.argv[2]) if len(sys.argv) > 2 else 8192
    fit(n_steps=n_steps, batch=batch)


if __name__ == "__main__":
    main()
