#!/usr/bin/env python
"""Hierarchical two-stage factored scatter at the 3D fine-level shape —
the round-2/3-prescribed fallback, attempted and measured (round 4).

Shape: the one unlocked hashed 3D level (level 4): S=2^19 slots x F=2,
B=2^18 contributions of C*F=16 lanes, currently 3.7 ms/step on the bf16
scatter emitter (fusion.79 in _r4_3d_profile.txt, ~14 ns/contribution
including XLA's internal sort).

Design under test: sort contributions by slot, bucket the sorted stream
by hi digit (n_sub buckets of S/n_sub slots), pad each bucket to a
static capacity, then per-bucket dense one-hot MXU matmuls into the
bucket's slot window. Static shapes throughout (capacity 4x the mean —
overflow probability for uniform hashes is negligible at these sizes; an
exact production version would need a data-dependent spill pass, which
is itself the reason this can't replace the emitter: see below).

FLOPs budget (why this is expected to LOSE): the emitter's 14
ns/contribution buys 14e-9 * 394e12 ~ 5500 bf16 MXU FLOPs. A one-hot
matmul into a W-slot window costs 2*W*16 FLOPs/contribution (+2x for
capacity padding): W=128 -> 8192 padded FLOPs at MXU-unfriendly 16-lane
width, BEFORE the mandatory sort and the permute-GATHER that reorders
the B contribution rows (which alone runs at the same per-row emitter
rate as the scatter it replaces). Components are timed separately so the
conclusion attributes.

Run ON TPU:
    python -u benchmarks/probe_r4_twostage.py \
        > benchmarks/logs/_r4_twostage.txt 2>&1
"""

import sys
import time
from functools import partial
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
N_SUB = 2**12          # buckets of W = S/N_SUB = 128 slots
W = S // N_SUB
CAP = 4 * (B // N_SUB)  # 256: 4x the mean bucket load
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
    print(f"{name:52s} {ms:8.3f} ms", flush=True)
    return out, ms


def emitter(idx, rows):
    return (
        jnp.zeros((S, R), jnp.bfloat16)
        .at[idx]
        .add(rows.astype(jnp.bfloat16), mode="promise_in_bounds")
        .astype(jnp.float32)
    )


def two_stage(idx, rows):
    # Stage 0: sort contributions by slot (ascending).
    sidx, perm = jax.lax.sort([idx, jnp.arange(B, dtype=jnp.int32)],
                              num_keys=1)
    srows = rows[perm]  # the permute-gather (B rows)
    # Stage 1: bucket by hi digit with static capacity. Position of
    # contribution j within its bucket = j - first_occurrence(bucket).
    hi = sidx // W
    first = jnp.searchsorted(hi, jnp.arange(N_SUB, dtype=jnp.int32),
                             side="left").astype(jnp.int32)
    within = jnp.arange(B, dtype=jnp.int32) - first[hi]
    keep = within < CAP  # capacity drop (probe-only; exact needs spill)
    dest = hi * CAP + jnp.where(keep, within, CAP - 1)
    packed_rows = (
        jnp.zeros((N_SUB * CAP, R), jnp.bfloat16)
        .at[dest]
        .add(
            jnp.where(keep[:, None], srows, 0.0).astype(jnp.bfloat16),
            mode="promise_in_bounds",
        )
    )  # NOTE: itself a scatter, but to UNIQUE slots (within<CAP unique
    #    per bucket) — measures the reorder cost in emitter terms.
    lo = jnp.where(keep, sidx % W, 0)
    packed_lo = (
        jnp.zeros((N_SUB * CAP,), jnp.int32).at[dest].max(lo)
    )
    # Stage 2: per-bucket dense one-hot matmuls into the W-slot window.
    oh = (
        packed_lo.reshape(N_SUB, CAP, 1)
        == jnp.arange(W, dtype=jnp.int32).reshape(1, 1, W)
    ).astype(jnp.bfloat16)
    out = jnp.einsum(
        "bcw,bcr->bwr",
        oh,
        packed_rows.reshape(N_SUB, CAP, R),
        preferred_element_type=jnp.float32,
    )
    return out.reshape(S, R)


def stage_sort(idx, rows):
    sidx, perm = jax.lax.sort([idx, jnp.arange(B, dtype=jnp.int32)],
                              num_keys=1)
    return sidx, perm


def stage_permute(rows, perm):
    return rows[perm]


def stage_matmul(packed_lo, packed_rows):
    oh = (
        packed_lo.reshape(N_SUB, CAP, 1)
        == jnp.arange(W, dtype=jnp.int32).reshape(1, 1, W)
    ).astype(jnp.bfloat16)
    return jnp.einsum(
        "bcw,bcr->bwr",
        oh,
        packed_rows.reshape(N_SUB, CAP, R),
        preferred_element_type=jnp.float32,
    )


def main():
    print(f"backend: {jax.default_backend()}  S={S} B={B} "
          f"n_sub={N_SUB} W={W} cap={CAP}", flush=True)
    idx = jnp.asarray(r.integers(0, S, (B,)), jnp.int32)
    rows = jnp.asarray(r.normal(size=(B, R)), jnp.float32)

    ref, _ = timed("emitter bf16 scatter (baseline)", emitter, idx, rows)
    got, _ = timed("two-stage (sort+bucket+MXU)", two_stage, idx, rows)

    # Correctness (both accumulate in bf16 but in different orders —
    # compare against an f64 oracle loosely, and report capacity drops).
    counts = np.bincount(np.asarray(idx) // W, minlength=N_SUB)
    print(f"max bucket load {counts.max()} of cap {CAP} "
          f"({'OK' if counts.max() <= CAP else 'OVERFLOW — result wrong'})",
          flush=True)
    oracle = np.zeros((S, R), np.float64)
    np.add.at(oracle, np.asarray(idx),
              np.asarray(rows, np.float64))
    for nm, v in (("emitter", ref), ("two-stage", got)):
        err = np.abs(np.asarray(v, np.float64) - oracle).max()
        print(f"{nm:10s} max abs err vs f64 oracle: {err:.3e}", flush=True)

    sidx, perm = jax.jit(stage_sort)(idx, rows)
    timed("  component: sort", stage_sort, idx, rows)
    timed("  component: permute-gather rows[perm]", stage_permute,
          rows, perm)
    plo = jnp.asarray(r.integers(0, W, (N_SUB * CAP,)), jnp.int32)
    prw = jnp.asarray(
        r.normal(size=(N_SUB * CAP, R)), jnp.float32
    ).astype(jnp.bfloat16)
    timed("  component: bucket one-hot matmuls", stage_matmul, plo, prw)


if __name__ == "__main__":
    main()
