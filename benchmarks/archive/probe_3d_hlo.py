#!/usr/bin/env python
"""Dump optimized HLO for the 3D encoding backward (composition mystery).

The composed backward with bf16 scatters runs 222 ms while the same 12
scatters standalone run 50 ms; operand/output optimization barriers change
nothing. This dumps the optimized HLO of both programs so the difference
can be read off directly (scatter op shapes, fused computations, extra
ops between them).

Run ON TPU: python -u benchmarks/probe_3d_hlo.py > _probe_hlo.txt 2>&1
Outputs: _hlo_enc_bwd.txt, _hlo_standalone.txt
"""

import sys
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

ROOT = Path(__file__).resolve().parent.parent


def enc_config(scatter):
    return {
        "otype": "HashGrid", "n_levels": 16, "n_features_per_level": 2,
        "log2_hashmap_size": 19, "base_resolution": 16,
        "per_level_scale": 1.5, "hash": "CoherentAdditive",
        "gather_strategy": "quad", "scatter_strategy": scatter,
    }


def main():
    print("backend:", jax.default_backend(), flush=True)
    r = np.random.default_rng(0)
    batch = 2**18
    xyz = jnp.asarray(r.uniform(0, 1, (batch, 3)).astype(np.float32))

    e = tc.create_encoding(3, enc_config("xla_half"))
    params = jnp.asarray(e.initialize_params(PCG32(7)))

    def enc_bwd(p, x):
        return jax.grad(
            lambda q: (e.apply(q, x).astype(jnp.float32) ** 2).sum()
        )(p).sum()

    c = jax.jit(enc_bwd).lower(params, xyz).compile()
    txt = c.as_text()
    (ROOT / "_hlo_enc_bwd.txt").write_text(txt)
    print("enc_bwd HLO:", len(txt), "chars", flush=True)

    # Standalone program: 12 bf16 scatters of the same shapes (iso3's fast
    # case) in one jit.
    S = 2**19
    sizes = [S] * 12
    rows = [jnp.asarray(r.normal(0, 1, (batch, 16)).astype(np.float32),
                        jnp.bfloat16) for _ in sizes]
    idxs = [jnp.asarray(r.integers(0, s, batch).astype(np.int32))
            for s in sizes]

    def standalone(rows, idxs):
        tot = 0.0
        for rw, ix, s in zip(rows, idxs, sizes):
            out = (
                jnp.zeros((s, 16), jnp.bfloat16)
                .at[ix]
                .add(rw, mode="promise_in_bounds")
            )
            tot = tot + out.astype(jnp.float32).sum()
        return tot

    c2 = jax.jit(standalone).lower(rows, idxs).compile()
    txt2 = c2.as_text()
    (ROOT / "_hlo_standalone.txt").write_text(txt2)
    print("standalone HLO:", len(txt2), "chars", flush=True)


if __name__ == "__main__":
    main()
