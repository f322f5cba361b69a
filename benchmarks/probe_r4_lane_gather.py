#!/usr/bin/env python
"""Round-4 serving attack probe: lane-major (channel-first) fine-level
gathers vs the current row gathers.

The serving profile (_r4_serving_profile.txt + _r4_serving_hlo.txt)
attributes 13 of the 18.6 ms device raster to the 5 fine-level quad
gathers: each writes f32[2^20, 8] in {1,0:T(8,128)} — the 8-lane minor
dim padded 16x to 128 lanes, a 512 MB write (1.885 ms) — then relayouts
it to the compact {0,1} form the consumer wants (0.71 ms). The useful
data is 32 MB. Hypothesis: gather along LANES from a transposed
(8, S) table -> (8, B) output, whose natural layout is compact
(8 sublanes x B lanes), killing both the padded write and the copy;
the channel-first result also feeds the CF FFMLP without a transpose.

Cases (S=2^15 quad rows, R=8 = 4 corners x F=2, B=2^20):
  A  row gather t[i] -> (B,8)                      [current serving form]
  B  row gather + corner lerp -> (B,2)             [current + consumer]
  C  lane gather tT[:, i] -> (8,B)
  D  lane gather + corner lerp (channel-first) -> (2,B)
  E  C in bf16 table
  F  D in bf16 table
  G  5-level composed: current (concat (B,10)) vs lane (concat (10,B))

Run ON TPU:
    python -u benchmarks/probe_r4_lane_gather.py \
        > benchmarks/logs/_r4_lane_gather.txt 2>&1
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

S = 2**15
R = 8
B = 2**20
REPS = 20

r = np.random.default_rng(0)


def timed(name, fn, *args):
    c = jax.jit(fn)
    out = c(*args)
    _ = float(jnp.ravel(jax.tree_util.tree_leaves(out)[0])[0])
    t0 = time.perf_counter()
    for _ in range(REPS):
        out = c(*args)
    _ = float(jnp.ravel(jax.tree_util.tree_leaves(out)[0])[0])
    ms = (time.perf_counter() - t0) / REPS * 1e3
    print(f"{name:44s} {ms:8.3f} ms", flush=True)
    return out, ms


def main():
    print("backend:", jax.default_backend(), flush=True)
    table = jnp.asarray(r.normal(size=(S, R)), jnp.float32)
    tableT = jnp.asarray(np.asarray(table).T)  # (R, S)
    idx = jnp.asarray(r.integers(0, S, (B,)), jnp.int32)
    w = jnp.asarray(r.random((B, 4)), jnp.float32)
    wT = jnp.asarray(np.asarray(w).T)  # (4, B)

    outA, _ = timed("A  row gather (B,8)", lambda t, i: t[i], table, idx)

    def lerp_rows(t, i, w):
        rows = t[i]
        return sum(
            w[:, c : c + 1] * rows[:, 2 * c : 2 * c + 2] for c in range(4)
        )

    outB, _ = timed("B  row gather + lerp (B,2)", lerp_rows, table, idx, w)

    outC, _ = timed(
        "C  lane gather (8,B)", lambda t, i: t[:, i], tableT, idx
    )
    assert np.allclose(np.asarray(outC).T, np.asarray(outA)), "C mismatch"

    def lerp_lanes(tT, i, wT):
        cols = tT[:, i]  # (8, B)
        return sum(
            wT[c : c + 1] * cols[2 * c : 2 * c + 2] for c in range(4)
        )

    outD, _ = timed(
        "D  lane gather + lerp (2,B)", lerp_lanes, tableT, idx, wT
    )
    assert np.allclose(
        np.asarray(outD).T, np.asarray(outB), atol=1e-5
    ), "D mismatch"

    tT16 = tableT.astype(jnp.bfloat16)
    timed("E  lane gather bf16 (8,B)", lambda t, i: t[:, i], tT16, idx)
    timed(
        "F  lane gather bf16 + f32 lerp (2,B)",
        lambda t, i, ww: lerp_lanes(t.astype(jnp.float32), i, ww),
        tT16,
        idx,
        wT,
    )
    # F2: lerp directly in bf16 (weights cast down), output bf16.
    timed(
        "F2 lane gather bf16 + bf16 lerp (2,B)",
        lerp_lanes,
        tT16,
        idx,
        wT.astype(jnp.bfloat16),
    )

    # G: 5 levels composed, same table (cache-hot upper bound on locality,
    # identical for both forms so the COMPARISON stands).
    idx5 = [
        jnp.asarray(r.integers(0, S, (B,)), jnp.int32) for _ in range(5)
    ]
    w5 = [jnp.asarray(r.random((B, 4)), jnp.float32) for _ in range(5)]
    w5T = [jnp.asarray(np.asarray(x).T) for x in w5]

    def g_rows(t, idxs, ws):
        return jnp.concatenate(
            [lerp_rows(t, i, ww) for i, ww in zip(idxs, ws)], axis=1
        )

    def g_lanes(tT, idxs, wTs):
        return jnp.concatenate(
            [lerp_lanes(tT, i, ww) for i, ww in zip(idxs, wTs)], axis=0
        )

    outG1, _ = timed("G1 5-level rows concat (B,10)", g_rows, table, idx5, w5)
    outG2, _ = timed(
        "G2 5-level lanes concat (10,B)", g_lanes, tableT, idx5, w5T
    )
    assert np.allclose(
        np.asarray(outG2).T, np.asarray(outG1), atol=1e-5
    ), "G mismatch"
    print("parity checks passed", flush=True)


if __name__ == "__main__":
    main()
