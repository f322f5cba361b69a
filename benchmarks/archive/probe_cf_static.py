#!/usr/bin/env python
"""Channel-first layout A/B for the stratified static coarse path.

Hypothesis (PLAN.md round 2): the static path is bandwidth-bound on
lane-PADDED bytes — every intermediate carries the (2^d*F)=8-wide channel
dim minor (16x tile padding on (…, 8) f32) and the per-level outputs are
(B, 2)-narrow (64x). A channel-FIRST layout (channels in sublanes, the
big spatial/batch dim in lanes) makes every array compact, at the cost of
one final (L*F, B) -> (B, L*F) transpose.

This probe times the current e.apply (9-level all-static flagship config)
against a from-scratch channel-first replica of identical math, fwd and
fwd+bwd, B=2^18. Parity is checked exactly before timing.

Run ON TPU: python -u benchmarks/probe_cf_static.py > _probe_cf.txt 2>&1
"""

import functools
import itertools
import math
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
from tcnn_tpu.utils.sampling import stratified_uniform  # noqa: E402

ENC_CONFIG = {
    "otype": "HashGrid", "n_levels": 9, "n_features_per_level": 2,
    "log2_hashmap_size": 15, "base_resolution": 16,
    "per_level_scale": 1.5, "hash": "CoherentAdditive",
    "gather_strategy": "stratified", "scatter_strategy": "auto",
}

BATCH = 2**18


def run(name, fn, *args, reps=15):
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
    return ms


def make_cf_apply(e, batch, transpose_out=True):
    d = e.n_dims_to_encode
    F = e.n_features_per_level
    L = e.n_levels
    C = 2**d
    strata = round(batch ** (1.0 / d))
    assert strata**d == batch
    corners = e._corners  # (C, d) bits

    def cf_apply(params, x):
        xT = x.T  # (d, B) — the ONE entry transpose
        table = params.reshape(-1, F)
        outs = []
        for lvl in range(L):
            scale = float(e.scales[lvl])
            res = int(e.resolutions[lvl])
            size = int(e.offset_table[lvl + 1] - e.offset_table[lvl])
            off = int(e.offset_table[lvl])
            n_var = int(math.ceil(scale / strata)) + 1
            assert scale <= e.raster_max_scale and n_var <= e.stratified_max_variants

            pos = xT * scale + 0.5
            pos_floor = jnp.floor(pos)
            pos_grid = pos_floor.astype(jnp.int32)  # (d, B)
            w = pos - pos_floor  # (d, B), Linear

            bits = jnp.asarray(corners, jnp.float32)  # (C, d)
            weights = jnp.prod(
                bits[:, :, None] * w[None, :, :]
                + (1.0 - bits[:, :, None]) * (1.0 - w[None, :, :]),
                axis=1,
            )  # (C, B)

            c0 = np.floor(
                np.arange(strata) / strata * scale + 0.5
            ).astype(np.int64)
            dim_bits = []
            for dim in range(d):
                c0_dim = jnp.tile(
                    jnp.repeat(jnp.asarray(c0, jnp.int32), strata**dim),
                    strata ** (d - 1 - dim),
                )
                dim_bits.append(jnp.clip(pos_grid[dim] - c0_dim, 0, n_var - 1))

            # Channel-first quad table: (C*F, size), rows corner-major.
            slT = table[off : off + size].T  # (F, size)
            strides = [res**k for k in range(d)]
            rows = []
            for cbits in corners:
                delta = sum(int(b) * s for b, s in zip(cbits, strides)) % size
                rows.append(jnp.roll(slT, -delta, axis=1) if delta else slT)
            quad_cf = jnp.concatenate(rows, axis=0)  # (C*F, size)
            n_cells = res**d
            reps_ = -(-n_cells // size)
            Dq = quad_cf if reps_ == 1 else jnp.tile(quad_cf, (1, reps_))
            D = Dq[:, :n_cells].reshape((C * F,) + (res,) * d)

            cache = {(): D}

            def rows_for(shift):
                return jnp.asarray(np.minimum(c0 + shift, res - 1), jnp.int32)

            def partial_contract(prefix):
                if prefix in cache:
                    return cache[prefix]
                t = partial_contract(prefix[:-1])
                t = jnp.take(t, rows_for(prefix[-1]), axis=len(prefix))
                cache[prefix] = t
                return t

            def contract(deltas):
                t = partial_contract(tuple(reversed(deltas)))
                return t.reshape(C * F, batch)

            feats = jnp.zeros((C * F, batch), jnp.float32)
            for deltas in itertools.product(range(n_var), repeat=d):
                mask = functools.reduce(
                    jnp.logical_and,
                    (dim_bits[i] == deltas[i] for i in range(d)),
                )
                feats = jnp.where(mask[None, :], contract(list(deltas)), feats)

            outs.append(
                jnp.sum(
                    feats.reshape(C, F, batch) * weights[:, None, :], axis=0
                )
            )  # (F, B)
        ycf = jnp.concatenate(outs, axis=0)  # (L*F, B)
        return ycf.T if transpose_out else ycf

    return cf_apply


def main():
    print("backend:", jax.default_backend(), flush=True)
    e = tc.create_encoding(2, ENC_CONFIG)
    params = jnp.asarray(e.initialize_params(PCG32(7)))
    x = stratified_uniform(jax.random.PRNGKey(0), BATCH, dims=2)
    L, F = e.n_levels, e.n_features_per_level

    cf = make_cf_apply(e, BATCH, transpose_out=True)
    cf_not = make_cf_apply(e, BATCH, transpose_out=False)

    # exact parity first
    y_ref = np.asarray(jax.jit(e.apply)(params, x))[:, : L * F]
    y_cf = np.asarray(jax.jit(cf)(params, x))
    print("fwd parity max_abs:", float(np.abs(y_ref - y_cf).max()), flush=True)

    def cur_fwd(p, x):
        return e.apply(p, x).astype(jnp.float32).sum()

    def cf_fwd(p, x):
        return cf(p, x).sum()

    def cf_fwd_not(p, x):
        return cf_not(p, x).sum()

    def cur_bwd(p, x):
        return jax.grad(
            lambda q: (e.apply(q, x).astype(jnp.float32) ** 2).sum()
        )(p).sum()

    def cf_bwd(p, x):
        return jax.grad(lambda q: (cf(q, x) ** 2).sum())(p).sum()

    def cf_bwd_not(p, x):
        return jax.grad(lambda q: (cf_not(q, x) ** 2).sum())(p).sum()

    g_ref = np.asarray(jax.jit(jax.grad(
        lambda q: (e.apply(q, x).astype(jnp.float32)[:, : L * F] ** 2).sum()
    ))(params))
    g_cf = np.asarray(jax.jit(jax.grad(
        lambda q: (cf(q, x) ** 2).sum()
    ))(params))
    print("bwd parity max_abs:", float(np.abs(g_ref - g_cf).max()),
          " rel:", float(np.abs(g_ref - g_cf).max() / (np.abs(g_ref).max() + 1e-30)),
          flush=True)

    run("cur enc fwd [L9 static]", cur_fwd, params, x)
    run("cf  enc fwd [L9 static]", cf_fwd, params, x)
    run("cf  enc fwd (no out-T) ", cf_fwd_not, params, x)
    run("cur enc bwd [L9 static]", cur_bwd, params, x)
    run("cf  enc bwd [L9 static]", cf_bwd, params, x)
    run("cf  enc bwd (no out-T) ", cf_bwd_not, params, x)


if __name__ == "__main__":
    main()
