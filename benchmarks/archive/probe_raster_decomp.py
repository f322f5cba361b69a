#!/usr/bin/env python
"""Serving decomposition: where does flagship inference time go?

MLP alone, encoding-only by strategy (quad / stratified-static / raster
windows), per-level-count sweeps. All at B=2^18 raster centers.

Run ON TPU: python -u benchmarks/probe_raster_decomp.py > _probe_rdec.txt 2>&1
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
from tcnn_tpu.rng import PCG32  # noqa: E402
from tcnn_tpu.utils.sampling import raster_centers  # noqa: E402


def run(name, fn, *args, reps=30):
    t0 = time.time()
    c = jax.jit(fn).lower(*args).compile()
    compile_s = time.time() - t0
    out = c(*args)
    _ = float(jax.tree_util.tree_leaves(out)[0].ravel()[0])
    t0 = time.perf_counter()
    for _i in range(reps):
        out = c(*args)
    _ = float(jax.tree_util.tree_leaves(out)[0].ravel()[0])
    ms = (time.perf_counter() - t0) / reps * 1e3
    print(f"{name}: {ms:7.3f} ms  (compile {compile_s:.0f}s)", flush=True)


def enc_cfg(n_levels, gather="quad"):
    return {
        "otype": "HashGrid", "n_levels": n_levels,
        "n_features_per_level": 2, "log2_hashmap_size": 15,
        "base_resolution": 16, "per_level_scale": 1.5,
        "hash": "CoherentAdditive", "gather_strategy": gather,
    }


def main():
    print("backend:", jax.default_backend(), flush=True)
    side = 512
    x = jnp.asarray(raster_centers(side, 2))

    # MLP alone (64x2 FFMLP on 32-wide input)
    net = tc.networks.create_network(
        32, 16, {"otype": "FullyFusedMLP", "n_neurons": 64,
                 "n_hidden_layers": 2})
    nparams = jnp.asarray(net.initialize_params(PCG32(1)))
    h = jnp.asarray(
        np.random.default_rng(0).uniform(-1, 1, (side * side, 32))
        .astype(np.float32))

    def mlp_fwd(p, h):
        return net.apply(p, h).astype(jnp.float32).sum()

    run("MLP 64x2 fwd", mlp_fwd, nparams, h)

    for tag, gather, levels in [
        ("quad L16", "quad", 16),
        ("quad L11 (coarse only)", "quad", 11),
        ("strat L16", "stratified", 16),
        ("strat L11", "stratified", 11),
    ]:
        e = tc.create_encoding(2, enc_cfg(levels, gather))
        p = jnp.asarray(e.initialize_params(PCG32(2)))

        def enc_fwd(p, x, e=e):
            kw = {"stratified": True} if gather == "stratified" else {}
            return e.apply(p, x, **kw).astype(jnp.float32).sum()

        run(f"enc fwd [{tag}]", enc_fwd, p, x)

    # raster windows by level count
    for levels in (11, 13, 16):
        e = tc.create_encoding(2, enc_cfg(levels, "quad"))
        p = jnp.asarray(e.initialize_params(PCG32(2)))

        def enc_raster(p, e=e):
            return e.apply_raster(p, side).astype(jnp.float32).sum()

        run(f"enc raster L{levels}", enc_raster, p)


if __name__ == "__main__":
    main()
