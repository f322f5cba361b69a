#!/usr/bin/env python
"""Gather-emitter response surface at the 3D locked-forward shape.

The composed 3D profile (_r4_3d_profile.txt) shows 12 forward quad
gathers at 1.19 ms each — B=2^18 rows from (2^19, 16) f32 tables, output
{0,1:T(8,128)}S(1) — i.e. 4.5 ns/row, while the serving raster's
gathers (B=2^20 from (2^15, 8), output {1,0} padded + relayout copy) run
at 1.8 ns/row + 0.7 copy ≈ 2.6 ns/row. Both are "the XLA gather
emitter", so the 1.7x spread must come from row width / table size /
output layout / fused consumers. Map the surface:

  a. t[i] at the 3D shape (S=2^19, R=16, B=2^18)         [baseline]
  b. a + optimization_barrier on the result (pin natural layout)
  c. bf16 table (half the row bytes)
  d. two (S, 8) tables gathered separately, lane-concat    [serving row width]
  e. packed (S/8, 128) rows, B=2^18 row fetches            [8 cells/row]
  f. same gather from a small (2^15, 16) table             [table locality]
  g. a + corner-lerp consumer fused (composed forward form)
  h. gather idx SORTED ascending (locality of reference)   [upper bound]

Run ON TPU:
    python -u benchmarks/probe_r4_gatherforms.py \
        > benchmarks/logs/_r4_gatherforms.txt 2>&1
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
    print(f"{name:52s} {ms:8.3f} ms  ({ms / B * 1e6:.2f} ns/row)",
          flush=True)
    return out, ms


def main():
    print("backend:", jax.default_backend(), flush=True)
    table = jnp.asarray(r.normal(size=(S, R)), jnp.float32)
    idx = jnp.asarray(r.integers(0, S, (B,)), jnp.int32)

    timed("a  t[i] (2^19,16)->(2^18,16)", lambda t, i: t[i], table, idx)
    timed(
        "b  a + barrier",
        lambda t, i: jax.lax.optimization_barrier(t[i]),
        table,
        idx,
    )
    timed(
        "c  bf16 table",
        lambda t, i: t[i],
        table.astype(jnp.bfloat16),
        idx,
    )

    t8a, t8b = table[:, :8], table[:, 8:]
    timed(
        "d  2x (S,8) gathers, lane concat",
        lambda a, b, i: jnp.concatenate([a[i], b[i]], axis=1),
        t8a,
        t8b,
        idx,
    )

    packed = jnp.asarray(r.normal(size=(S // 8, 128)), jnp.float32)
    idx8 = idx // 8
    timed("e  packed (S/8,128) row fetch", lambda t, i: t[i], packed, idx8)

    small = jnp.asarray(r.normal(size=(2**15, R)), jnp.float32)
    idx_s = jnp.asarray(r.integers(0, 2**15, (B,)), jnp.int32)
    timed("f  small table (2^15,16)", lambda t, i: t[i], small, idx_s)

    w = jnp.asarray(r.random((B, 8)), jnp.float32)

    def lerped(t, i, ww):
        rows = t[i].reshape(B, 8, 2)
        return (rows * ww[:, :, None]).sum(1)

    timed("g  gather + corner lerp", lerped, table, idx, w)

    idx_sorted = jnp.sort(idx)
    timed("h  sorted idx", lambda t, i: t[i], table, idx_sorted)

    # h2: fully coherent (iota) — the absolute emitter floor.
    idx_iota = jnp.arange(B, dtype=jnp.int32)
    timed("h2 iota idx", lambda t, i: t[i], table, idx_iota)

    # i: gather with promise_in_bounds (serving uses checked mode too,
    # but the locked path uses pib — measure both).
    timed(
        "i  pib gather",
        lambda t, i: t.at[i].get(mode="promise_in_bounds"),
        table,
        idx,
    )


if __name__ == "__main__":
    main()
