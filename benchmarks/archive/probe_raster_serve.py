#!/usr/bin/env python
"""Serving-path probe: trainer.inference vs trainer.inference_raster.

Flagship config at side=512 (2^18 samples) + the NeRF-scale 3D config at
side=64 (2^18). Target (VERDICT r1 #4): >=1e8 samples/s single-chip.

Run ON TPU: python -u benchmarks/probe_raster_serve.py > _probe_raster.txt 2>&1
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
from tcnn_tpu.utils.sampling import raster_centers  # noqa: E402
from __graft_entry__ import FLAGSHIP_CONFIG  # noqa: E402


def timeit(name, fn, reps=30):
    t0 = time.time()
    out = fn()
    _ = float(out.ravel()[0])
    compile_s = time.time() - t0
    t0 = time.perf_counter()
    for _i in range(reps):
        out = fn()
    _ = float(out.ravel()[0])
    ms = (time.perf_counter() - t0) / reps * 1e3
    n = out.shape[0]
    print(
        f"{name}: {ms:7.3f} ms  {n/ms*1e3:.3e} samples/s  "
        f"(first-call {compile_s:.0f}s)",
        flush=True,
    )
    return ms


def main():
    print("backend:", jax.default_backend(), flush=True)

    # 2D flagship
    m = tc.create_from_config(2, 3, FLAGSHIP_CONFIG)
    side = 512
    x = jnp.asarray(raster_centers(side, 2))
    timeit("2D chunk inference  ", lambda: m.trainer.inference(x))
    timeit("2D raster inference ", lambda: m.trainer.inference_raster(side))
    # parity
    a = np.asarray(m.trainer.inference(x))
    b = np.asarray(m.trainer.inference_raster(side))
    print("2D parity max_abs:", np.abs(a - b).max(), flush=True)

    # 3D NeRF-scale
    cfg3 = {
        "encoding": {
            "otype": "HashGrid", "n_levels": 16, "n_features_per_level": 2,
            "log2_hashmap_size": 19, "base_resolution": 16,
            "per_level_scale": 1.5, "hash": "CoherentAdditive",
            "gather_strategy": "quad",
        },
        "network": {
            "otype": "FullyFusedMLP", "n_neurons": 64, "n_hidden_layers": 2,
            "activation": "ReLU", "output_activation": "None",
        },
        "loss": {"otype": "RelativeL2"},
        "optimizer": {"otype": "Adam", "learning_rate": 1e-2},
    }
    m3 = tc.create_from_config(3, 1, cfg3)
    side3 = 64  # 2^18 samples
    x3 = jnp.asarray(raster_centers(side3, 3))
    timeit("3D chunk inference  ", lambda: m3.trainer.inference(x3))
    timeit("3D raster inference ", lambda: m3.trainer.inference_raster(side3))
    a = np.asarray(m3.trainer.inference(x3))
    b = np.asarray(m3.trainer.inference_raster(side3))
    print("3D parity max_abs:", np.abs(a - b).max(), flush=True)

    # 3D stratified config (strata 64): levels 0-5 take the separable path.
    cfg3s = dict(cfg3)
    cfg3s["encoding"] = dict(
        cfg3["encoding"], gather_strategy="stratified", strata=64
    )
    m3s = tc.create_from_config(3, 1, cfg3s)
    timeit("3D strat chunk inference ", lambda: m3s.trainer.inference(x3))
    timeit("3D strat raster inference", lambda: m3s.trainer.inference_raster(side3))
    a = np.asarray(m3s.trainer.inference(x3))
    b = np.asarray(m3s.trainer.inference_raster(side3))
    print("3D strat parity max_abs:", np.abs(a - b).max(), flush=True)


if __name__ == "__main__":
    main()
