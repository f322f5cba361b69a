#!/usr/bin/env python
"""3D backward: is the f32 cast being fused back into the bf16 scatter?

iso2 showed the scatter path is the whole 216 ms and the INPUT barrier is
a no-op. This tests OUTPUT-side barriers and rebaselines the standalone
scatter (same shapes, same process) with and without a fused f32 cast.

Run ON TPU: python -u benchmarks/probe_3d_iso3.py > _probe3d_iso3.txt 2>&1
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

    # Standalone rebaselines, same shapes as one in-context level:
    # B=2^18 rows of 16 bf16 into (2^19, 16).
    S = 2**19
    idxs = [
        jnp.asarray(rr.integers(0, S, batch).astype(np.int32))
        for rr in (np.random.default_rng(i) for i in range(12))
    ]
    rows = jnp.asarray(r.normal(0, 1, (batch, 16)).astype(np.float32),
                       jnp.bfloat16)

    def scat12_bf16(rows, *idxs):
        outs = []
        for i in idxs:
            outs.append(
                jnp.zeros((S, 16), jnp.bfloat16)
                .at[i]
                .add(rows, mode="promise_in_bounds")
            )
        return sum(o.astype(jnp.float32).sum() for o in outs)

    run("standalone 12x bf16 (sum f32)", scat12_bf16, rows, *idxs)

    def scat12_bf16_cast(rows, *idxs):
        outs = []
        for i in idxs:
            o = (
                jnp.zeros((S, 16), jnp.bfloat16)
                .at[i]
                .add(rows, mode="promise_in_bounds")
            ).astype(jnp.float32)  # fused cast on the scatter output
            outs.append(o * 1.000001)  # force the f32 tensor to exist
        return sum(o.sum() for o in outs)

    run("standalone 12x bf16 + fused f32 cast", scat12_bf16_cast, rows, *idxs)

    def scat12_bf16_barrier(rows, *idxs):
        outs = []
        for i in idxs:
            o = (
                jnp.zeros((S, 16), jnp.bfloat16)
                .at[i]
                .add(rows, mode="promise_in_bounds")
            )
            o = jax.lax.optimization_barrier(o).astype(jnp.float32)
            outs.append(o * 1.000001)
        return sum(o.sum() for o in outs)

    run("standalone 12x bf16 + barrier + cast", scat12_bf16_barrier,
        rows, *idxs)

    # In-context: output barrier modes.
    for mode in ("xla_half_ob", "xla_half_bb"):
        enc = tc.create_encoding(3, enc_config(mode))
        params = jnp.asarray(enc.initialize_params(PCG32(7)))

        def enc_bwd(p, x, e=enc):
            return jax.grad(
                lambda q: (e.apply(q, x).astype(jnp.float32) ** 2).sum()
            )(p).sum()

        run(f"enc_bwd[{mode}]", enc_bwd, params, xyz)


if __name__ == "__main__":
    main()
