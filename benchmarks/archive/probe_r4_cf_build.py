#!/usr/bin/env python
"""Channel-first (CF) quad-table build vs the slice build, at the 3D
fine-level shape.

The 3D profile pins 9.7 ms/step to the flat params vector materializing
as a (6.5M, 2) view in TWO layouts (64x-lane-padded {1,0} + compact
{0,1}) — XLA's way of deinterleaving the flat (i*F + f) storage into the
(size, F) tables the per-level 2D rolls want. The compact copy feeds
roll-slice fusions that emit {0,1:T(2,128)} slices, and the quad tables
materialize as (size, 16){0,1} — i.e. the PRODUCT is channel-first-
compact; only the deinterleave route is padded. Hypothesis: deinterleave
manually in never-padded ops — F strided 1D slices (feature planes),
1D rolls per corner, stack to (C*F, size) [minor dim = size, compact],
transpose to (size, C*F) [pure layout flip, should be free] — and the
padded intermediate disappears while the row-gather emitter path stays
byte-identical.

Cases (size=2^19, F=2, C=8, B=2^18; 12 such levels in the real step):
  A  slice build + row gather        [current composed form]
  B  cf build + row gather
  C  build-only A (barrier-pinned)
  D  build-only B (barrier-pinned)
  E  cf build + LANE gather (16, B)  [channel-first end-to-end]
  F  12-level composed: A-form vs B-form sharing one flat vector

Run ON TPU:
    python -u benchmarks/probe_r4_cf_build.py \
        > benchmarks/logs/_r4_cf_build.txt 2>&1
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

SIZE = 2**19
F = 2
C = 8
B = 2**18
REPS = 20
DELTAS = [0, 1, 77, 78, 5929, 5930, 6006, 6007]  # stride-pattern stand-ins

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
    print(f"{name:46s} {ms:8.3f} ms", flush=True)
    return out, ms


def build_slice(flat):
    sl = flat.reshape(SIZE, F)
    cols = [jnp.roll(sl, -d, axis=0) if d else sl for d in DELTAS]
    return jnp.concatenate(cols, axis=1)


def build_cf(flat):
    planes = [
        jax.lax.slice(flat, (f,), (SIZE * F,), (F,)) for f in range(F)
    ]
    rows = []
    for d in DELTAS:
        for f in range(F):
            p = planes[f]
            rows.append(jnp.roll(p, -d) if d else p)
    return jnp.stack(rows, axis=0).T  # (SIZE, C*F)


def main():
    print("backend:", jax.default_backend(), flush=True)
    flat = jnp.asarray(r.normal(size=(SIZE * F,)), jnp.float32)
    idx = jnp.asarray(r.integers(0, SIZE, (B,)), jnp.int32)

    ref = np.asarray(jax.jit(build_slice, backend="cpu")(np.asarray(flat)))
    got = np.asarray(jax.jit(build_cf, backend="cpu")(np.asarray(flat)))
    assert np.array_equal(ref, got), "cf build mismatch (CPU)"
    print("CPU build parity OK", flush=True)

    outA, _ = timed(
        "A  slice build + row gather", lambda p, i: build_slice(p)[i],
        flat, idx,
    )
    outB, _ = timed(
        "B  cf build + row gather", lambda p, i: build_cf(p)[i], flat, idx
    )
    assert np.array_equal(np.asarray(outA), np.asarray(outB)), "A/B gather"

    timed(
        "C  build-only slice (barrier)",
        lambda p: jax.lax.optimization_barrier(build_slice(p)),
        flat,
    )
    timed(
        "D  build-only cf (barrier)",
        lambda p: jax.lax.optimization_barrier(build_cf(p)),
        flat,
    )
    timed(
        "E  cf build + lane gather (16,B)",
        lambda p, i: build_cf(p).T[:, i],
        flat,
        idx,
    )

    # F: 12 levels sharing one flat vector (the real step's layout
    # pressure: every level's build reads the same global buffer).
    NL = 12
    big = jnp.asarray(r.normal(size=(NL * SIZE * F,)), jnp.float32)
    idxs = [jnp.asarray(r.integers(0, SIZE, (B,)), jnp.int32)
            for _ in range(NL)]

    def multi(build):
        def fn(p, ii):
            outs = []
            for lvl in range(NL):
                fl = jax.lax.slice(
                    p, (lvl * SIZE * F,), ((lvl + 1) * SIZE * F,)
                )
                outs.append(build(fl)[ii[lvl]].sum(1))
            return sum(outs)
        return fn

    timed("F1 12-level slice build+gathers", multi(build_slice), big, idxs)
    timed("F2 12-level cf build+gathers", multi(build_cf), big, idxs)


if __name__ == "__main__":
    main()
