#!/usr/bin/env python
"""Windowed gather/scatter probe — fine-level speed-of-light candidate.

Design under test (PLAN round 2): with raster-additive strides on fine
hashed levels and x-run-correlated stratified jitter, every group of
n_strata consecutive samples touches ONE contiguous ~scale-row window of
the level's quad table. Then:
  fwd:  per-group window slice-gather (bandwidth) + within-window
        one-hot MXU einsum (exact: one-hot times bf16 rows, f32 acc).
  bwd:  per-group one-hot^T einsum into segment-aligned chunks + ONE
        aligned chunk scatter-add (or a segment one-hot einsum) — no
        per-row random scatter at all.

Shapes: one 3D NeRF-scale level (S=2^19 quad rows, R=16, B=2^18,
G=4096 groups of 64, window 1024, segment 1024).

Run ON TPU: python -u benchmarks/probe_window.py > _probe_window.txt 2>&1
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

S = 2**19
R = 16
B = 2**18
GSZ = 64            # samples per group (x-run)
G = B // GSZ        # 4096 groups
W = 1024            # window rows (covers scale ~686 + slack)
SEG = 1024
NSEG = S // SEG


def run(name, fn, *args, reps=20):
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


def main():
    print("backend:", jax.default_backend(), flush=True)
    r = np.random.default_rng(0)
    table = jnp.asarray(r.normal(0, 1, (S, R)).astype(np.float32))
    table16 = table.astype(jnp.bfloat16)
    rows = jnp.asarray(r.normal(0, 1, (B, R)).astype(np.float32),
                       jnp.bfloat16)
    # Group starts: random segment-aligned-ish; local offsets in [0, 686).
    starts = jnp.asarray(
        (r.integers(0, S - W, G)).astype(np.int32))
    local = jnp.asarray(r.integers(0, 686, (G, GSZ)).astype(np.int32))
    gidx = (starts[:, None] + local).reshape(-1)  # (B,) global indices

    # ---- baselines -------------------------------------------------------
    def row_scatter_bf16(rows, gidx):
        return (
            jnp.zeros((S, R), jnp.bfloat16)
            .at[gidx]
            .add(rows, mode="promise_in_bounds")
        ).astype(jnp.float32).sum()

    run("bwd row-scatter bf16 (baseline)", row_scatter_bf16, rows, gidx)

    def row_gather(table, gidx):
        return table.at[gidx].get(mode="promise_in_bounds").sum()

    run("fwd row-gather f32 (baseline)", row_gather, table, gidx)
    run("fwd row-gather bf16 (baseline)", row_gather, table16, gidx)

    # ---- forward: window slice-gather + one-hot einsum -------------------
    def win_gather(table, starts, local):
        win = jax.vmap(
            lambda s: jax.lax.dynamic_slice(table, (s, 0), (W, R))
        )(starts)  # (G, W, R)
        iota = jax.lax.broadcasted_iota(jnp.int32, (G, GSZ, W), 2)
        oh = (local[:, :, None] == iota).astype(table.dtype)  # (G, GSZ, W)
        feats = jnp.einsum(
            "gbw,gwr->gbr", oh, win,
            preferred_element_type=jnp.float32,
        )
        return feats.sum()

    run("fwd window gather+onehot f32", win_gather, table, starts, local)
    run("fwd window gather+onehot bf16", win_gather, table16, starts, local)

    # window slice-gather alone (no einsum)
    def win_only(table, starts):
        win = jax.vmap(
            lambda s: jax.lax.dynamic_slice(table, (s, 0), (W, R))
        )(starts)
        return win.astype(jnp.float32).sum()

    run("fwd window slices only f32", win_only, table, starts)
    run("fwd window slices only bf16", win_only, table16, starts)

    # ---- backward: one-hot^T chunks + aligned chunk add -------------------
    seg0 = starts // SEG                     # (G,)
    base = seg0 * SEG
    local2 = gidx.reshape(G, GSZ) - base[:, None]  # in [0, 2*SEG)

    def bwd_chunks_scatter(rows, local2, seg0):
        rws = rows.reshape(G, GSZ, R)
        iota = jax.lax.broadcasted_iota(jnp.int32, (G, GSZ, 2 * SEG), 2)
        oh = (local2[:, :, None] == iota).astype(jnp.bfloat16)
        chunks = jnp.einsum(
            "gbw,gbr->gwr", oh, rws, preferred_element_type=jnp.float32
        )  # (G, 2*SEG, R) f32
        chunks = chunks.reshape(G * 2, SEG, R)
        seg_ids = jnp.stack([seg0, seg0 + 1], axis=1).reshape(-1)
        out = (
            jnp.zeros((NSEG, SEG, R), jnp.float32)
            .at[seg_ids]
            .add(chunks, mode="promise_in_bounds")
        )
        return out.sum()

    run("bwd onehotT chunks + seg scatter", bwd_chunks_scatter,
        rows, local2, seg0)

    # stage 2 as a segment one-hot einsum instead of a scatter
    def bwd_chunks_einsum(rows, local2, seg0):
        rws = rows.reshape(G, GSZ, R)
        iota = jax.lax.broadcasted_iota(jnp.int32, (G, GSZ, 2 * SEG), 2)
        oh = (local2[:, :, None] == iota).astype(jnp.bfloat16)
        chunks = jnp.einsum(
            "gbw,gbr->gwr", oh, rws, preferred_element_type=jnp.float32
        ).reshape(G * 2, SEG * R).astype(jnp.bfloat16)
        seg_ids = jnp.stack([seg0, seg0 + 1], axis=1).reshape(-1)
        iota2 = jax.lax.broadcasted_iota(jnp.int32, (NSEG, G * 2), 0)
        oh2 = (seg_ids[None, :] == iota2).astype(jnp.bfloat16)
        out = jnp.dot(oh2, chunks, preferred_element_type=jnp.float32)
        return out.sum()

    run("bwd onehotT chunks + seg einsum", bwd_chunks_einsum,
        rows, local2, seg0)

    # stage 1 cost alone (chunks einsum, no reduction to table)
    def bwd_chunks_only(rows, local2):
        rws = rows.reshape(G, GSZ, R)
        iota = jax.lax.broadcasted_iota(jnp.int32, (G, GSZ, 2 * SEG), 2)
        oh = (local2[:, :, None] == iota).astype(jnp.bfloat16)
        chunks = jnp.einsum(
            "gbw,gbr->gwr", oh, rws, preferred_element_type=jnp.float32
        )
        return chunks.sum()

    run("bwd chunks einsum only", bwd_chunks_only, rows, local2)


if __name__ == "__main__":
    main()
