#!/usr/bin/env python
"""Fused-pair factored scatter: one (hi,B)@(B,2*lo*R) matmul vs two.

The compensated bf16 pair runs TWO MXU passes sharing the (B, hi)
one-hot operand — each pass re-reads ~512 MB of one-hot at flagship
shape. Concatenating [strip_hi | strip_res/256] along lanes fuses them
into ONE matmul that reads the one-hot once (same FLOPs, half the
one-hot traffic). This probes standalone per-level cost and the
composed 2D flagship step.

Run ON TPU: python -u benchmarks/probe_pair1.py > _probe_pair1.txt 2>&1
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

from tcnn_tpu.ops.scatter_rows import scatter_rows_factored  # noqa: E402

B, S, R, LO = 2**18, 2**15, 8, 32


def fused_pair(idx, rows, size, lo_width=LO):
    s_pad = -(-size // lo_width) * lo_width
    hi_w = s_pad // lo_width
    hi = (idx // lo_width).astype(jnp.int32)
    lo = (idx % lo_width).astype(jnp.int32)
    iota_lo = jnp.arange(lo_width, dtype=jnp.int32)[None, :]
    lo_mask = (iota_lo == lo[:, None])[..., None]

    def strip(r):
        return jnp.where(lo_mask, r[:, None, :], r.dtype.type(0)).reshape(
            B, lo_width * R
        )

    iota_hi = jnp.arange(hi_w, dtype=jnp.int32)[None, :]
    oh_hi = (iota_hi == hi[:, None]).astype(jnp.bfloat16)
    rows32 = rows.astype(jnp.float32)
    r_hi = jax.lax.optimization_barrier(rows32.astype(jnp.bfloat16))
    r_res = ((rows32 - r_hi.astype(jnp.float32)) * 256.0).astype(jnp.bfloat16)
    strips2 = jnp.concatenate([strip(r_hi), strip(r_res)], axis=1)
    out2 = jnp.dot(oh_hi.T, strips2, preferred_element_type=jnp.float32)
    lr = lo_width * R
    out = out2[:, :lr] + (1.0 / 256.0) * out2[:, lr:]
    return out.reshape(s_pad, R)[:size]


def timeit(name, fn, *args, reps=30):
    t0 = time.time()
    c = jax.jit(fn).lower(*args).compile()
    compile_s = time.time() - t0
    out = c(*args)
    _ = float(out.ravel()[0])
    t0 = time.perf_counter()
    for _i in range(reps):
        out = c(*args)
    _ = float(out.ravel()[0])
    ms = (time.perf_counter() - t0) / reps * 1e3
    print(f"{name}: {ms:7.3f} ms (compile {compile_s:.0f}s)", flush=True)


def main():
    print("backend:", jax.default_backend(), flush=True)
    r = np.random.default_rng(0)
    idx = jnp.asarray(r.integers(0, S, B).astype(np.int32))
    rows = jnp.asarray(r.normal(0, 1, (B, R)).astype(np.float32))

    a = np.asarray(jax.jit(
        lambda i, g: scatter_rows_factored(i, g, S)
    )(idx, rows))
    b = np.asarray(jax.jit(lambda i, g: fused_pair(i, g, S))(idx, rows))
    rel = np.abs(a - b).max() / (np.abs(a).max() + 1e-30)
    print("fused vs two-pass parity rel:", rel, flush=True)

    # 5 levels composed, like the flagship backward
    def five(fn):
        def f(idx, rows):
            tot = 0.0
            for k in range(5):
                tot = tot + fn(
                    (idx + k * 977) % S, rows * (1.0 + 0.1 * k), S
                ).sum()
            return jnp.asarray(tot).reshape(1)

        return f

    timeit("two-pass x5 ", five(scatter_rows_factored), idx, rows)
    timeit("fused-pair x5", five(fused_pair), idx, rows)
    timeit(
        "two-pass x1 ",
        lambda i, g: scatter_rows_factored(i, g, S).sum().reshape(1),
        idx, rows,
    )
    timeit(
        "fused-pair x1",
        lambda i, g: fused_pair(i, g, S).sum().reshape(1),
        idx, rows,
    )


if __name__ == "__main__":
    main()
