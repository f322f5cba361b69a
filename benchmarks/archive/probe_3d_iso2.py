#!/usr/bin/env python
"""3D NeRF-scale backward decomposition, round 2 (VERDICT r1 #1).

Round-1 follow-up: the first 'drop' measurement was invalid (the mode
fell through _scatter_mode's auto logic to xla_half). With drop fixed,
this isolates (a) what the backward costs with NO table gradient at all,
(b) whether the emitter's slowness in context comes from XLA fusing the
gradient-row computation INTO the scatter loop (barrier variants).

Run ON TPU: python -u benchmarks/probe_3d_iso2.py > _probe3d_iso2.txt 2>&1
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


def enc_config(scatter):
    return {
        "otype": "HashGrid", "n_levels": 16, "n_features_per_level": 2,
        "log2_hashmap_size": 19, "base_resolution": 16,
        "per_level_scale": 1.5, "hash": "CoherentAdditive",
        "gather_strategy": "quad", "scatter_strategy": scatter,
    }


def run(name, fn, *args, reps=10):
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
    print(f"{name}: {ms:.1f} ms  (compile {compile_s:.0f}s)", flush=True)


def main():
    print("backend:", jax.default_backend(), flush=True)
    r = np.random.default_rng(0)
    batch = 2**18
    xyz = jnp.asarray(r.uniform(0, 1, (batch, 3)).astype(np.float32))

    encs = {}
    for mode in ("drop", "xla_half", "xla_half_b", "xla_f32_b"):
        encs[mode] = tc.create_encoding(3, enc_config(mode))
    params = jnp.asarray(encs["drop"].initialize_params(PCG32(7)))

    enc = encs["drop"]
    run("enc_fwd", lambda p, x: enc.apply(p, x).astype(jnp.float32).sum(),
        params, xyz)

    for mode, e in encs.items():
        def enc_bwd(p, x, e=e):
            return jax.grad(
                lambda q: (e.apply(q, x).astype(jnp.float32) ** 2).sum()
            )(p).sum()

        run(f"enc_bwd[{mode}]", enc_bwd, params, xyz)

    def enc_vgrad(p, x, e=encs["drop"]):
        v, g = jax.value_and_grad(
            lambda q: (e.apply(q, x).astype(jnp.float32) ** 2).sum()
        )(p)
        return v + g.sum()

    run("enc_vgrad[drop]", enc_vgrad, params, xyz)


if __name__ == "__main__":
    main()
