#!/usr/bin/env python
"""Standalone A/B: locked-level FORWARD via static-CSR one-hot matmuls.

The locked levels' forward currently rides the unpacked quad gather at
~2.5-2.7 ms/level (3D NeRF shape); the packed (B,128) gather alone costs
2.13 ms (probe_locked_fwd d) — the gather emitter's per-row rate ignores
that the indices are compile-time constants. This probe measures the
CSR alternative, which shares the backward's static-CSR constants:

  sorted rows:  out_sorted[b,m,:] = onehot(lo[b,m]) @ qp[b*128:(b+1)*128]
                (one einsum over nb buckets; table pre-rounded to an
                error-compensated bf16 pair -> 2 bf16 MXU passes, exact
                to ~2e-7 rel)
  slot select:  corner-block lane select by the STATIC slot (constants),
                fused into the einsum consumer, -> (nb*M, C*F) narrow
  un-permute:   one static take back to batch order ((B, C*F) rows)

Cases (one 3D fine level: S=2^19, K=8, C=8, F=2, B=2^18):
  a. unpacked quad gather + weight-combine      [current locked fwd]
  b. packed gather only (B,128)                 [floor reference]
  c. csr-pair einsum + static select + unpermute + weight-combine
  d. csr einsum f32 HIGHEST variant of (c)
Also prints max rel error of (c)/(d) vs (a).

Run ON TPU: python -u benchmarks/probe_csr_fwd.py > _csr_fwd.txt 2>&1
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

from tcnn_tpu.ops.scatter_rows import build_static_csr  # noqa: E402

SMALL = "--small" in sys.argv  # CPU correctness mode
S = 2**10 if SMALL else 2**19  # cells
F = 2
C = 8  # 3D corners
K = 128 // (C * F)  # 8
B = 2**12 if SMALL else 2**18
STRATA = 16 if SMALL else 64
W = 128


def run(name, fn, *args, reps=10):
    t0 = time.time()
    c = jax.jit(fn).lower(*args).compile()
    out = c(*args)
    _ = float(jax.tree_util.tree_leaves(out)[0].ravel()[0])
    dt = time.time() - t0
    t0 = time.perf_counter()
    for _ in range(reps):
        out = c(*args)
    _ = float(jax.tree_util.tree_leaves(out)[0].ravel()[0])
    ms = (time.perf_counter() - t0) / reps * 1e3
    print(f"{name}: {ms:7.3f} ms  (compile {dt:.0f}s)", flush=True)
    return c(*args)


def main():
    print("backend:", jax.default_backend(), flush=True)
    r = np.random.default_rng(0)

    # Locked-level index structure: base = (tile . q*strides) % S, one
    # dynamic scalar shift.  q*strides mod S with q = scale/strata.
    q = (64 if SMALL else 1408) // STRATA  # level-11-like scale
    strides = [1, 1483, 1483**2 % S]  # additive-hash-ish strides
    ids = np.arange(B, dtype=np.int64)
    acc = np.zeros(B, np.uint64)
    for dim in range(3):
        i_dim = (ids // STRATA**dim) % STRATA
        acc += i_dim.astype(np.uint64) * np.uint64(
            (q * strides[dim]) & 0xFFFFFFFF
        )
        acc &= 0xFFFFFFFF
    base_np = (acc % np.uint64(S)).astype(np.int64)

    flat = jnp.asarray(r.standard_normal(S * F).astype(np.float32))
    shift = jnp.int32(r.integers(0, S))
    weights = jnp.asarray(r.random((B, C)).astype(np.float32))
    deltas = [0]
    for cbits in range(1, C):
        dlt = 0
        for dim in range(3):
            if (cbits >> dim) & 1:
                dlt += strides[dim]
        deltas.append(dlt % S)

    # ---- CSR constants (static; shared with the backward) ----
    prow = base_np // K
    order, lo, nb, M = build_static_csr(prow, S // K, W)
    slot = (base_np % K).astype(np.int32)
    slot_sorted = np.full(order.shape, 0, np.int32)
    mask = order < B
    slot_sorted[mask] = slot[order[mask]]
    valid = mask.reshape(nb, M)
    slot_sorted = slot_sorted.reshape(nb, M)
    inv = np.empty(B, np.int64)
    inv[order[mask]] = np.nonzero(mask.reshape(-1))[0]
    inv = inv.astype(np.int32)
    print(f"nb={nb} M={M} pad={nb*M/B:.2f}", flush=True)

    def quad_unpacked(fl, sh):
        # (S, C*F) quad table of the shifted slice (dynamic roll first).
        fl2 = jnp.concatenate([fl, fl])
        rolled = jax.lax.dynamic_slice(
            fl2, (sh.astype(jnp.int32) * F,), (S * F,)
        )
        sl = rolled.reshape(S, F)
        cols = [
            jnp.roll(sl, -d, axis=0) if d else sl for d in deltas
        ]
        return jnp.concatenate(cols, axis=1)

    def packed_table(fl, sh):
        # (S/K, 128) corner-major packed table of the shifted slice.
        fl2 = jnp.concatenate([fl, fl])
        rolled = jax.lax.dynamic_slice(
            fl2, (sh.astype(jnp.int32) * F,), (S * F,)
        )
        rolls = []
        for d in deltas:
            rr = jnp.roll(rolled, -d * F) if d else rolled
            rolls.append(rr.reshape(S // K, K * F))
        return jnp.concatenate(rolls, axis=1)

    base_j = jnp.asarray(base_np.astype(np.int32))

    def case_a(fl, sh, w):
        quad = quad_unpacked(fl, sh)
        feats = quad.at[base_j].get(mode="promise_in_bounds")
        feats = feats.reshape(B, C, F)
        return jnp.sum(feats * w[..., None], axis=1)

    def case_b(fl, sh):
        qp = packed_table(fl, sh)
        return qp.at[base_j // K].get(mode="promise_in_bounds")

    ohw = jnp.asarray(
        (lo[:, :, None] == np.arange(W)[None, None, :])
    )  # (nb, M, W) bool
    ohk_np = (
        slot_sorted[:, :, None] == np.arange(K)[None, None, :]
    ) & valid[:, :, None]
    ohk = jnp.asarray(ohk_np)  # (nb, M, K) bool
    inv_j = jnp.asarray(inv)

    def csr_core(qp3, w, dtype, prec):
        # qp3: (nb, W, 128) table buckets in `dtype`.
        oh = ohw.astype(dtype)
        rows = jnp.einsum(
            "bmw,bwp->bmp", oh, qp3,
            preferred_element_type=jnp.float32, precision=prec,
        )  # (nb, M, 128) f32
        sel = (
            rows.reshape(nb, M, C, K, F)
            * ohk.astype(jnp.float32)[:, :, None, :, None]
        ).sum(3)  # (nb, M, C, F)
        feats = jnp.take(
            sel.reshape(nb * M, C * F), inv_j, axis=0
        ).reshape(B, C, F)
        return jnp.sum(feats * w[..., None], axis=1)

    def case_c(fl, sh, w):
        qp = packed_table(fl, sh)
        hi = jax.lax.optimization_barrier(qp.astype(jnp.bfloat16))
        res = ((qp - hi.astype(jnp.float32)) * 256.0).astype(jnp.bfloat16)
        out_hi = csr_core(hi.reshape(nb, W, 128), w, jnp.bfloat16, None)
        out_res = csr_core(res.reshape(nb, W, 128), w, jnp.bfloat16, None)
        return out_hi + (1.0 / 256.0) * out_res

    def case_d(fl, sh, w):
        qp = packed_table(fl, sh)
        return csr_core(
            qp.reshape(nb, W, 128), w, jnp.float32,
            jax.lax.Precision.HIGHEST,
        )

    ya = run("a unpacked gather+combine", case_a, flat, shift, weights)
    run("b packed gather only      ", case_b, flat, shift)
    yc = run("c csr-pair + select     ", case_c, flat, shift, weights)
    yd = run("d csr-f32-HIGHEST       ", case_d, flat, shift, weights)

    ya_np = np.asarray(ya)
    scale = np.abs(ya_np).max() + 1e-12
    print(f"rel err c vs a: {np.abs(np.asarray(yc)-ya_np).max()/scale:.2e}",
          flush=True)
    print(f"rel err d vs a: {np.abs(np.asarray(yd)-ya_np).max()/scale:.2e}",
          flush=True)
    print("PROBE_DONE", flush=True)


if __name__ == "__main__":
    main()
