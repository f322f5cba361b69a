#!/usr/bin/env python
"""Quality gate for the windowed fine-level design (CPU, small scale).

The windowed path changes two things that could hurt convergence:
  1. fine hashed levels index with raster strides mod S (a linear fold)
     instead of the prime-factor additive hash;
  2. the stratified sampler shares non-fastest-dim jitter across each
     dim-0 run.
This fits a 128x128 synthetic image with a 12-level S=1024 hash grid and
compares PSNR across {prime-hash, raster-hash} x {iid, run-correlated}.

Run (CPU): python -u benchmarks/probe_raster_quality.py
"""

import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

import jax

jax.config.update("jax_platforms", "cpu")

import jax.numpy as jnp  # noqa: E402
import numpy as np  # noqa: E402

import tcnn_tpu as tc  # noqa: E402
from tcnn_tpu.utils.sampling import stratified_uniform  # noqa: E402


def image(res=128):
    yy, xx = np.meshgrid(np.linspace(0, 1, res), np.linspace(0, 1, res),
                         indexing="ij")
    return np.stack(
        [
            0.5 + 0.5 * np.sin(8 * np.pi * xx) * np.cos(6 * np.pi * yy),
            0.5 + 0.5 * np.cos(4 * np.pi * (xx + yy)),
            0.5 + 0.5 * np.sin(6 * np.pi * (xx - yy)),
        ],
        axis=-1,
    ).astype(np.float32)


def fit(raster_all: bool, correlated: bool, seed: int, steps=600):
    cfg = {
        "loss": {"otype": "L2"},
        "optimizer": {"otype": "Adam", "learning_rate": 1e-2,
                      "beta2": 0.99, "epsilon": 1e-15},
        "encoding": {
            "otype": "HashGrid", "n_levels": 12,
            "n_features_per_level": 2, "log2_hashmap_size": 10,
            "base_resolution": 16, "per_level_scale": 1.5,
            "hash": "CoherentAdditive", "gather_strategy": "quad",
            "scatter_strategy": "xla",
        },
        "network": {"otype": "CutlassMLP", "n_neurons": 64,
                    "n_hidden_layers": 2},
    }
    model = tc.create_from_config(2, 3, cfg, seed=seed)
    if raster_all:
        model.model.encoding.raster_max_scale = 1e30
    trainer = model.trainer
    img = jnp.asarray(image())
    h = w = 128
    batch = 2**14

    @jax.jit
    def step(state, key):
        xy = stratified_uniform(key, batch, 2, run_correlated=correlated)
        ij_y = jnp.clip((xy[:, 1] * h).astype(jnp.int32), 0, h - 1)
        ij_x = jnp.clip((xy[:, 0] * w).astype(jnp.int32), 0, w - 1)
        target = img.reshape(-1, 3)[ij_y * w + ij_x]
        return trainer._step_impl(state, xy, target, None)

    keys = jax.random.split(jax.random.PRNGKey(seed), steps)
    state = trainer.state
    for i in range(steps):
        state, loss = step(state, keys[i])
    trainer.state = state

    yy, xx = np.meshgrid((np.arange(h) + 0.5) / h, (np.arange(w) + 0.5) / w,
                         indexing="ij")
    pts = jnp.asarray(
        np.stack([xx.ravel(), yy.ravel()], -1).astype(np.float32)
    )
    pred = np.asarray(trainer.inference(pts))[:, :3].reshape(h, w, 3)
    mse = float(np.mean((pred - image()) ** 2))
    return -10 * np.log10(mse)


def main():
    for raster_all in (False, True):
        for correlated in (False, True):
            psnrs = [fit(raster_all, correlated, s) for s in (1, 2, 3)]
            print(
                f"raster_all={int(raster_all)} corr={int(correlated)}: "
                f"PSNR {np.mean(psnrs):.2f} dB "
                f"(runs: {', '.join(f'{p:.2f}' for p in psnrs)})",
                flush=True,
            )


if __name__ == "__main__":
    main()
