#!/usr/bin/env python
"""Locked-level FORWARD structure probe: unpacked vs packed+static-select.

The locked path's forward is the unpacked quad gather — its (B, C*F=16)
output lands 8x lane-padded (the padded bytes ARE the measured cost;
PLAN round-2 session 3, finding 3). The packed quad table's (B, 128)
gather output is layout-compact, and for PHASE-LOCKED levels the slot
select is NEARLY static: slot = (base%K + shift%K) % K with base%K a
compile-time constant and shift a traced scalar, so the one-hot is a
constant (B, K) mask "rolled" by one scalar — no per-sample index
arithmetic. If packed+static-select beats the unpacked gather, the 3D
locked forward (12 levels x ~3-4.5 ms) has ~2 ms/level headroom.

Variants at the 3D fine-level shape (S=2^19, B=2^18, C=8, F=2, K=8):
  a. unpacked quad gather (current p_fn)                (B, 128)->(B,16)
  b. packed gather + DYNAMIC slot select (round-2 form)
  c. packed gather + static-base one-hot select (locked form)
  d. packed gather alone (floor)

Run ON TPU: python -u benchmarks/probe_locked_fwd.py > _locked_fwd.txt 2>&1
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

B, S, C, F = 2**18, 2**19, 8, 2
K = 128 // (C * F)  # 8


def timeit(name, fn, *args, reps=20):
    t0 = time.time()
    try:
        c = jax.jit(fn).lower(*args).compile()
    except Exception as e:  # noqa: BLE001
        print(f"{name}: COMPILE FAILED: {str(e)[:200]}", flush=True)
        return
    compile_s = time.time() - t0
    out = c(*args)
    _ = float(np.asarray(out).ravel()[0])
    t0 = time.perf_counter()
    for _i in range(reps):
        out = c(*args)
    _ = float(np.asarray(out).ravel()[0])
    ms = (time.perf_counter() - t0) / reps * 1e3
    print(f"{name}: {ms:8.3f} ms (compile {compile_s:.0f}s)", flush=True)


def main():
    print("backend:", jax.default_backend(), flush=True)
    r = np.random.default_rng(0)
    base = r.integers(0, S, B).astype(np.int64)  # static cell indices
    quad = jnp.asarray(r.normal(0, 1, (S, C * F)).astype(np.float32))
    packed = jnp.asarray(
        r.normal(0, 1, (S // K, 128)).astype(np.float32)
    )
    shift = jnp.int32(12345)  # traced scalar
    base_dev = jnp.asarray(base.astype(np.int32))
    w = jnp.asarray(r.normal(0, 1, (B, C)).astype(np.float32))

    # a. unpacked quad gather + weight combine -> (B, F)
    def a_unpacked(q, sh, wt):
        idx = (base_dev + sh) % S
        rows = q.at[idx].get(mode="promise_in_bounds")  # (B, C*F)
        return (
            (rows.reshape(B, C, F) * wt[:, :, None]).sum(1).sum()
        ).reshape(1)

    timeit("a unpacked gather+combine", a_unpacked, quad, shift, w)

    # b. packed gather + dynamic slot select (round-2 packed form)
    def b_dynamic(p, sh, wt):
        idx = (base_dev + sh) % S
        g = p.at[idx // K].get(mode="promise_in_bounds")  # (B, 128)
        oh = (
            jnp.arange(K, dtype=jnp.int32)[None, :]
            == (idx % K)[:, None]
        ).astype(p.dtype)  # (B, K) dynamic
        rows = (g.reshape(B, C, K, F) * oh[:, None, :, None]).sum(2)
        return ((rows * wt[:, :, None]).sum(1).sum()).reshape(1)

    timeit("b packed + dynamic select", b_dynamic, packed, shift, w)

    # c. packed gather + static-base one-hot (locked form): slot =
    #    (base%K + sh%K) % K -> constant (B,) rolled by a scalar; the
    #    one-hot is eye(K) taken at that value.
    base_mod = jnp.asarray((base % K).astype(np.int32))
    eye = jnp.eye(K, dtype=jnp.float32)

    def c_static(p, sh, wt):
        idx = (base_dev + sh) % S
        g = p.at[idx // K].get(mode="promise_in_bounds")  # (B, 128)
        slot = (base_mod + sh % K) % K  # constant + scalar
        oh = eye[slot]  # (B, K) via tiny-table take
        rows = (g.reshape(B, C, K, F) * oh[:, None, :, None]).sum(2)
        return ((rows * wt[:, :, None]).sum(1).sum()).reshape(1)

    timeit("c packed + static select", c_static, packed, shift, w)

    # d. packed gather alone (row-fetch floor)
    def d_floor(p, sh):
        idx = (base_dev + sh) % S
        g = p.at[idx // K].get(mode="promise_in_bounds")
        return g.sum().reshape(1)

    timeit("d packed gather only", d_floor, packed, shift)
    print("PROBE_DONE", flush=True)


if __name__ == "__main__":
    main()
