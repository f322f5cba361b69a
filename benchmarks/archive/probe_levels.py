"""Probe: marginal cost of each grid level in the encoding-only backward.

Times grad(sum(enc(x)^2)) wrt grid params for n_levels = 1..16 on the
flagship quad-path config; the difference between consecutive rows is the
marginal cost of that level's gather+scatter.
"""

import sys as _sys
from pathlib import Path as _P
_sys.path.insert(0, str(_P(__file__).resolve().parent.parent))

import sys
import time

import jax

jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

import jax.numpy as jnp
import numpy as np

import tcnn_tpu as tc

r = np.random.default_rng(0)
batch = 2**18
xy = jnp.asarray(r.uniform(0, 1, (batch, 2)).astype(np.float32))

log2_hashmap = int(sys.argv[1]) if len(sys.argv) > 1 else 19
scale = float(sys.argv[2]) if len(sys.argv) > 2 else 2.0

prev = 0.0
for L in range(1, 17):
    enc = tc.create_encoding(
        2,
        {
            "otype": "HashGrid",
            "n_levels": L,
            "n_features_per_level": 2,
            "log2_hashmap_size": log2_hashmap,
            "base_resolution": 16,
            "per_level_scale": scale,
            "hash": "CoherentAdditive",
            "gather_strategy": "quad",
        },
    )
    params = jnp.asarray(
        enc.initialize_params(tc.rng.PCG32(1337)), jnp.float32
    )

    def enc_bwd(p, x, enc=enc):
        g = jax.grad(
            lambda pe: (enc.apply(pe, x).astype(jnp.float32) ** 2).sum()
        )(p)
        return g.sum()

    t0 = time.time()
    c = jax.jit(enc_bwd).lower(params, xy).compile()
    ct = time.time() - t0
    _ = float(c(params, xy))
    t0 = time.time()
    reps = 5
    for _i in range(reps):
        out = c(params, xy)
    _ = float(out)
    ms = (time.time() - t0) / reps * 1e3
    size = int(enc.offset_table[L] - enc.offset_table[L - 1])
    print(
        f"L={L:2d} size_of_last={size:7d} bwd={ms:8.1f} ms  marginal={ms-prev:7.1f} ms  (compile {ct:.0f}s)",
        flush=True,
    )
    prev = ms
