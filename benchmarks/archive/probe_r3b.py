#!/usr/bin/env python
"""Dissect the phase-locked transpose at the 3D NeRF-scale level shape.

probe_3d_locked measured the composed locked step at 151.7 ms vs 121.1
for the hybrid/emitter path — the opposite of probe_r3_static's 2.1x
standalone win. Hypothesis: the 3D CSR's W=128 buckets give M~95, so the
bucketed einsum runs as 4096 tiny (128,95)@(95,256) matmuls at terrible
MXU efficiency (the 2D case wins because M~17k), plus the pair spread's
256-lane traffic. This probe measures the REAL t_fn composition
(spread + reorder + einsum) at S=2^19, B=2^18, C=8, F=2 for
W in {128, 256, 512, 1024} x rounding {pair, single}, against the
incumbent hybrid t_fn (slot spread + bf16 emitter scatter on (B,128)
rows).

Run ON TPU: python -u benchmarks/probe_r3b.py > _probe_r3b.txt 2>&1
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

from tcnn_tpu.ops.scatter_rows import (  # noqa: E402
    build_static_csr,
    scatter_packed_static_csr,
)

B, S, C, F = 2**18, 2**19, 8, 2
K = 128 // (C * F)
R0 = C * F


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
    cells = r.integers(0, S, B).astype(np.int64)
    prow = (cells // K).astype(np.int64)
    slot = (cells % K).astype(np.int32)
    rows = jnp.asarray(r.normal(0, 1, (B, R0)).astype(np.float32))
    slot_dyn = jnp.asarray(slot)
    prow_dyn = jnp.asarray(prow.astype(np.int32))

    # Incumbent: hybrid t_fn — slot spread + bf16 emitter on (B,128) rows.
    def hybrid_tfn(dfeats, sl, pr):
        oh = (
            jnp.arange(K, dtype=jnp.int32)[None, :] == sl[:, None]
        )
        g = dfeats.reshape(B, C, 1, F) * oh[:, None, :, None].astype(
            dfeats.dtype
        )
        g128 = g.reshape(B, C * K * F).astype(jnp.bfloat16)
        out = (
            jnp.zeros((S // K, C * K * F), jnp.bfloat16)
            .at[pr]
            .add(g128, mode="promise_in_bounds")
        )
        return out.astype(jnp.float32).sum().reshape(1)

    timeit("hybrid emitter t_fn (incumbent)", hybrid_tfn, rows, slot_dyn,
           prow_dyn)

    for W in (128, 256, 512, 1024):
        order, lo, nb, M = build_static_csr(prow, S // K, W)
        ss = np.full(order.shape, -1, np.int32)
        mask = order < B
        ss[mask] = slot[order[mask]]
        ss = ss.reshape(nb, M)
        print(f"  [W={W}] nb={nb} M={M} pad={nb*M/B:.2f}", flush=True)
        for rounding in ("pair", "single"):
            timeit(
                f"csr W={W:<4} {rounding:6}",
                lambda rws, o=order, l=lo, s=ss, n=nb, m=M, w=W,
                rd=rounding: scatter_packed_static_csr(
                    rws, o, l, s, n, m, K, F, S // K, rd, bucket_width=w
                ).sum().reshape(1),
                rows,
            )
    print("PROBE_DONE", flush=True)


if __name__ == "__main__":
    main()
