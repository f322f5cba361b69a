"""Probe: XLA scatter-add vs Pallas one-hot matmul vs Pallas serial RMW
for the grid-gradient row reduction, plus sort/cumsum building blocks.

B = 2^18 rows of R=8 floats reduced into (S, 8) for several level sizes S.
Each variant is composed into a jit with a scalar consumer (sum) to keep
XLA honest. Correctness is asserted against a numpy reference first.
"""

import time

import jax

jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

import jax.numpy as jnp
import numpy as np

from tcnn_tpu.ops.scatter_rows import scatter_rows_onehot, scatter_rows_serial

B = 2**18
R = 8
r = np.random.default_rng(0)


def timeit(name, fn, *args, reps=10):
    try:
        t0 = time.time()
        c = jax.jit(fn).lower(*args).compile()
        ct = time.time() - t0
        out = c(*args)
        _ = float(out)
        t0 = time.time()
        for _ in range(reps):
            out = c(*args)
        _ = float(out)
        ms = (time.time() - t0) / reps * 1e3
        print(f"{name}: {ms:8.2f} ms   (compile {ct:.0f}s)", flush=True)
    except Exception as e:
        print(f"{name}: FAILED {type(e).__name__}: {str(e)[:200]}", flush=True)


# -- correctness (tiny, on device) ------------------------------------------
S0 = 512
idx0 = jnp.asarray(r.integers(0, S0, 4096), jnp.int32)
rows0 = jnp.asarray(r.normal(size=(4096, R)), jnp.float32)
ref = np.zeros((S0, R), np.float32)
np.add.at(ref, np.asarray(idx0), np.asarray(rows0))
got1 = np.asarray(scatter_rows_onehot(idx0, rows0, S0, c_chunk=512))
got2 = np.asarray(scatter_rows_serial(idx0, rows0, S0, c_chunk=512))
print("onehot maxerr:", np.abs(got1 - ref).max(), flush=True)
print("serial maxerr:", np.abs(got2 - ref).max(), flush=True)

# -- timing ------------------------------------------------------------------
rows = jnp.asarray(r.normal(size=(B, R)), jnp.float32)

for S in (4096, 16384, 65536, 262144, 524288):
    idx = jnp.asarray(r.integers(0, S, B), jnp.int32)

    def xla_scatter(i, v, S=S):
        t = jnp.zeros((S, R), jnp.float32)
        t = t.at[i].add(v, mode="promise_in_bounds")
        return t.sum()

    timeit(f"S={S:6d} xla_scatter  ", xla_scatter, idx, rows)
    timeit(
        f"S={S:6d} onehot_matmul",
        lambda i, v, S=S: scatter_rows_onehot(i, v, S).sum(),
        idx,
        rows,
    )
    if S * R * 4 <= 4 * 2**20:
        timeit(
            f"S={S:6d} serial_rmw   ",
            lambda i, v, S=S: scatter_rows_serial(i, v, S).sum(),
            idx,
            rows,
        )

# -- building blocks for the sorted approach --------------------------------
keys = jnp.asarray(r.integers(0, 524288, B), jnp.uint32)

timeit("argsort 2^18 u32      ", lambda k: jnp.argsort(k).sum(), keys)
timeit(
    "sort+take rows        ",
    lambda k, v: jnp.take(v, jnp.argsort(k), axis=0).sum(),
    keys,
    rows,
)
timeit("cumsum (B,8) f32      ", lambda v: jnp.cumsum(v, axis=0).sum(), rows)


def segsum_pipeline(k, v, S=524288):
    order = jnp.argsort(k)
    sk = k[order]
    sv = jnp.take(v, order, axis=0)
    c = jnp.cumsum(sv, axis=0)
    c = jnp.concatenate([jnp.zeros((1, R), c.dtype), c], axis=0)
    hi = jnp.searchsorted(sk, jnp.arange(S, dtype=jnp.uint32), side="right")
    lo = jnp.searchsorted(sk, jnp.arange(S, dtype=jnp.uint32), side="left")
    return (c[hi] - c[lo]).sum()


timeit("full segsum pipeline  ", segsum_pipeline, keys, rows)
