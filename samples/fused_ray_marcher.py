#!/usr/bin/env python
"""Whole-program fusion demo: a NeRF-style ray marcher with the model inlined.

The reference's signature trick is stitching the model's generated device
function into a hand-written CUDA kernel (README.md:103-144), giving ~5x for
Instant-NGP's renderer. The TPU analogue is free: ``model.apply`` is a pure
traceable function, so embedding it inside any jitted program lets XLA fuse
encoding + MLP + ray-march accumulation into one compiled pipeline — no
codegen, no RTC.

This sample volume-renders a tiny density+color field represented by a
HashGrid + FullyFusedMLP, marching N steps per ray inside one ``lax.scan``
under a single jit.
"""

from __future__ import annotations

import sys
import time
from pathlib import Path

import numpy as np

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

CONFIG = {
    "encoding": {
        "otype": "HashGrid",
        "n_levels": 8,
        "n_features_per_level": 2,
        "log2_hashmap_size": 15,
        "base_resolution": 8,
        "per_level_scale": 1.6,
    },
    "network": {
        "otype": "FullyFusedMLP",
        "n_neurons": 64,
        "n_hidden_layers": 2,
        "output_activation": "None",
    },
}


def main():
    import jax
    import jax.numpy as jnp

    from tcnn_tpu import NetworkWithInputEncoding
    from tcnn_tpu.rng import make_rng

    # 3D position -> (density, r, g, b)
    model = NetworkWithInputEncoding(
        3, 4, encoding_config=CONFIG["encoding"],
        network_config=CONFIG["network"],
    )
    params = jnp.asarray(model.initialize_params(make_rng(1337)))

    n_rays = 4096
    n_steps = 64
    dt = 1.0 / n_steps

    @jax.jit
    def render(params, origins, dirs):
        """March all rays; the model runs inside the scan body — XLA fuses
        encoding+MLP+compositing into one program."""

        def step(carry, i):
            color, transmittance = carry
            t = (i.astype(jnp.float32) + 0.5) * dt
            pos = origins + dirs * t  # rays through the unit cube
            raw = model.apply(params, pos).astype(jnp.float32)
            sigma = jax.nn.softplus(raw[:, 0:1])
            rgb = jax.nn.sigmoid(raw[:, 1:4])
            alpha = 1.0 - jnp.exp(-sigma * dt)
            color = color + transmittance * alpha * rgb
            transmittance = transmittance * (1.0 - alpha)
            return (color, transmittance), None

        init = (jnp.zeros((origins.shape[0], 3)), jnp.ones((origins.shape[0], 1)))
        (color, transmittance), _ = jax.lax.scan(
            step, init, jnp.arange(n_steps)
        )
        return color, transmittance

    r = np.random.default_rng(0)
    origins = jnp.asarray(
        np.stack([r.uniform(0, 1, n_rays), r.uniform(0, 1, n_rays),
                  np.zeros(n_rays)], 1).astype(np.float32)
    )
    dirs = jnp.asarray(
        np.stack([np.zeros(n_rays), np.zeros(n_rays), np.ones(n_rays)], 1)
        .astype(np.float32)
    )

    t0 = time.perf_counter()
    color, transmittance = render(params, origins, dirs)
    color.block_until_ready()
    print(f"compile+first render: {time.perf_counter()-t0:.2f}s")

    t0 = time.perf_counter()
    for _ in range(10):
        color, transmittance = render(params, origins, dirs)
    c = float(color[0, 0])
    per = (time.perf_counter() - t0) / 10
    rays_per_s = n_rays / per
    print(f"render: {per*1e3:.2f} ms for {n_rays} rays x {n_steps} steps "
          f"({rays_per_s:.3g} rays/s, {rays_per_s*n_steps:.3g} samples/s)")
    print(f"mean color {np.asarray(color).mean(0)}, "
          f"mean transmittance {float(transmittance.mean()):.3f}")


if __name__ == "__main__":
    main()
