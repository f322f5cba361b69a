#!/usr/bin/env python
"""Round-3 decision probe: static-index scatter replacements.

Premise (PLAN.md round-3): with phase-locked stratified sampling (one
shared jitter vector per batch) and fine-level scales snapped to strata
multiples, every fine level's table indices become a COMPILE-TIME
constant plus one dynamic scalar table roll. That converts the
per-sample scatter-add (bf16 emitter, ~22 ns/row — the 3D config's
dominant cost) into:

  roll(table) + static reorder-gather + tiny bucketed one-hot matmuls

whose per-row op is a GATHER (measured 2-9 ns/row in context) and whose
matmul FLOPs are 2*B*W*R (W = bucket width, ~1000x fewer than the
factored scatter's 2*B*S*R).

This probe measures every ingredient and the composed replacement at
the 2D flagship fine-level shape (S=2^15, R=8) and the 3D NeRF-scale
shape (S=2^19, R=16), B=2^18 both:

  - xla emitter scatter-add: bf16 / f32 / bf16-with-constant-indices
  - current factored pair (2D shape; the incumbent)
  - pure static reorder-gather of B rows (take with constant indices)
  - dynamic-index gather of the same rows (for contrast)
  - bucketed one-hot matmul scatter, W in {32, 128} (composed, incl.
    the reorder-gather and the runtime one-hot build)
  - jnp.roll of the (S, R) table by a traced scalar
  - forward gather with constant vs dynamic indices
  - scatter_rows_serial (sliced Mosaic VMEM RMW kernel, 2D shape only —
    VERDICT r2 next-1a; 3D accumulator exceeds VMEM)

Run ON TPU: python -u benchmarks/probe_r3_static.py > _probe_r3.txt 2>&1
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

B = 2**18


def timeit(name, fn, *args, reps=30):
    t0 = time.time()
    try:
        c = jax.jit(fn).lower(*args).compile()
    except Exception as e:  # noqa: BLE001 — probe must keep going
        print(f"{name}: COMPILE FAILED: {type(e).__name__}: {str(e)[:300]}",
              flush=True)
        return None
    compile_s = time.time() - t0
    out = c(*args)
    _ = float(np.asarray(out).ravel()[0])
    t0 = time.perf_counter()
    for _i in range(reps):
        out = c(*args)
    _ = float(np.asarray(out).ravel()[0])
    ms = (time.perf_counter() - t0) / reps * 1e3
    print(f"{name}: {ms:8.3f} ms (compile {compile_s:.0f}s)", flush=True)
    return ms


def make_buckets(targets, S, W):
    """Static bucket structure: order (nb*M,) int32 row ids (sentinel B),
    lo (nb, M) int32 in-bucket offsets (sentinel -1)."""
    nb = -(-S // W)
    bucket = targets // W
    lo = targets % W
    counts = np.bincount(bucket, minlength=nb)
    M = int(counts.max())
    order = np.full((nb, M), B, np.int32)
    lo_pad = np.full((nb, M), -1, np.int32)
    fill = np.zeros(nb, np.int64)
    srt = np.argsort(bucket, kind="stable")
    for r in srt:
        b = bucket[r]
        order[b, fill[b]] = r
        lo_pad[b, fill[b]] = lo[r]
        fill[b] += 1
    pad_ratio = nb * M / len(targets)
    return order.reshape(-1), lo_pad, nb, M, pad_ratio


def bucket_scatter(rows, order, lo_pad, nb, M, W, S, R):
    """Composed static-CSR scatter: reorder-gather + one-hot matmuls ->
    dense (S, R) f32 directly (no expand step)."""
    rows_pad = jnp.concatenate(
        [rows.astype(jnp.bfloat16), jnp.zeros((1, R), jnp.bfloat16)]
    )
    r3 = jnp.take(rows_pad, order, axis=0).reshape(nb, M, R)
    iota = jnp.arange(W, dtype=jnp.int32)
    oh = (lo_pad[:, :, None] == iota[None, None, :]).astype(jnp.bfloat16)
    out = jnp.einsum(
        "bmw,bmr->bwr", oh, r3, preferred_element_type=jnp.float32
    )
    return out.reshape(nb * W, R)[:S]


def run_shape(tag, S, R, serial_ok):
    print(f"\n=== {tag}: B={B} S={S} R={R} ===", flush=True)
    r = np.random.default_rng(0)
    targets = r.integers(0, S, B).astype(np.int32)
    idx_const = targets  # numpy -> HLO constant
    rows = jnp.asarray(r.normal(0, 1, (B, R)).astype(np.float32))
    idx_dyn = jnp.asarray(targets)
    table = jnp.asarray(r.normal(0, 1, (S, R)).astype(np.float32))
    shift = jnp.asarray(12345, jnp.int32)

    # --- emitter baselines -------------------------------------------------
    def emit_bf16(rws, i):
        t = jnp.zeros((S, R), jnp.bfloat16).at[i].add(
            rws.astype(jnp.bfloat16)
        )
        return t.astype(jnp.float32).sum().reshape(1)

    def emit_f32(rws, i):
        return jnp.zeros((S, R), jnp.float32).at[i].add(rws).sum().reshape(1)

    timeit("emitter bf16 dyn-idx   ", emit_bf16, rows, idx_dyn)
    timeit("emitter f32  dyn-idx   ", emit_f32, rows, idx_dyn)
    timeit("emitter bf16 const-idx ",
           lambda rws: emit_bf16(rws, idx_const), rows)

    if S <= 2**16:
        from tcnn_tpu.ops.scatter_rows import scatter_rows_factored

        timeit(
            "factored pair (incumbent)",
            lambda i, g: scatter_rows_factored(i, g, S).sum().reshape(1),
            idx_dyn, rows,
        )

    # --- ingredient: reorder-gather ----------------------------------------
    perm = np.argsort(targets, kind="stable").astype(np.int32)
    timeit("reorder-gather const-idx",
           lambda rws: jnp.take(rws, perm, axis=0).sum().reshape(1), rows)
    perm_dyn = jnp.asarray(perm)
    timeit("reorder-gather dyn-idx ",
           lambda rws, p: jnp.take(rws, p, axis=0).sum().reshape(1),
           rows, perm_dyn)

    # --- composed bucket-matmul scatter ------------------------------------
    ref = None
    for W in (32, 128):
        order, lo_pad, nb, M, pad_ratio = make_buckets(targets, S, W)
        print(f"  [W={W}] nb={nb} M={M} pad_ratio={pad_ratio:.2f}",
              flush=True)
        ms = timeit(
            f"bucket-matmul W={W:<3} composed",
            lambda rws, o=order, l=lo_pad, n=nb, m=M, w=W: bucket_scatter(
                rws, o, l, n, m, w, S, R
            ).sum().reshape(1),
            rows,
        )
        if ms is not None and ref is None:
            got = np.asarray(
                jax.jit(
                    lambda rws, o=order, l=lo_pad, n=nb, m=M, w=W:
                    bucket_scatter(rws, o, l, n, m, w, S, R)
                )(rows)
            )
            want = np.zeros((S, R), np.float32)
            np.add.at(
                want, targets,
                np.asarray(rows, np.float32).astype(np.float32),
            )
            # bf16 rows -> tolerance ~1e-2 relative on sums
            rel = np.abs(got - want).max() / (np.abs(want).max() + 1e-30)
            print(f"  bucket-matmul parity vs f32 emitter: rel={rel:.2e}",
                  flush=True)
            ref = got

    # --- roll + forward gathers --------------------------------------------
    timeit("roll (S,R) traced shift",
           lambda t, s: jnp.roll(t, s, axis=0).sum().reshape(1),
           table, shift)
    timeit("fwd gather const-idx   ",
           lambda t: jnp.take(t, idx_const, axis=0).sum().reshape(1), table)
    timeit("fwd gather dyn-idx     ",
           lambda t, i: jnp.take(t, i, axis=0).sum().reshape(1),
           table, idx_dyn)

    # --- Mosaic serial VMEM RMW kernel (sliced) -----------------------------
    if serial_ok:
        from tcnn_tpu.ops.scatter_rows import scatter_rows_serial

        timeit(
            "serial VMEM RMW (sliced)",
            lambda i, g: scatter_rows_serial(i, g, S).sum().reshape(1),
            idx_dyn, rows, reps=5,
        )


def main():
    print("backend:", jax.default_backend(), flush=True)
    run_shape("2D flagship fine level", 2**15, 8, serial_ok=True)
    run_shape("3D NeRF-scale fine level", 2**19, 16, serial_ok=False)
    print("\nPROBE_DONE", flush=True)


if __name__ == "__main__":
    main()
