"""Probe: Mosaic (jax 0.9.0) capabilities for table-resident grid kernels.

The flagship config's whole quad table set (16 levels x 32768 x 8 f32 =
16 MiB... actually 10 hashed levels at 1 MiB + 6 small dense ones) fits in
v5e VMEM. The blocker recorded in PLAN.md (older jax) was that Mosaic had
no vectorized VMEM gather and rejected dynamic-index row RMW. Re-test on
jax 0.9.0:

  A. in-kernel vectorized gather: jnp.take(table, idx, axis=0), table in
     VMEM (S, 8) f32, idx (N,) int32.
  B. in-kernel dynamic-index row RMW accumulate: acc[i] += v inside
     fori_loop (serial scatter).
  C. in-kernel one-hot MXU gather for reference.
  D. jax.lax.gather via table[idx] inside the kernel.

Each: correctness vs numpy on tiny sizes, then timing at useful sizes.
"""

import functools
import time

import jax

jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

r = np.random.default_rng(0)


def timeit(name, fn, *args, reps=20):
    try:
        t0 = time.time()
        c = jax.jit(fn).lower(*args).compile()
        ct = time.time() - t0
        out = c(*args)
        _ = float(jnp.sum(out))
        t0 = time.time()
        for _ in range(reps):
            out = c(*args)
        _ = float(jnp.sum(out))
        ms = (time.time() - t0) / reps * 1e3
        print(f"{name}: {ms:8.3f} ms   (compile {ct:.0f}s)", flush=True)
        return out
    except Exception as e:
        print(f"{name}: FAILED {type(e).__name__}: {str(e)[:300]}", flush=True)
        return None


# ---------------------------------------------------------------------------
# A. Vectorized VMEM gather via jnp.take inside a kernel.
#    Grid over batch blocks; table fully resident per block.
# ---------------------------------------------------------------------------
def take_kernel(table_ref, idx_ref, out_ref):
    idx = idx_ref[0]  # (NB,) int32
    out_ref[:] = jnp.take(table_ref[:], idx, axis=0, fill_value=0.0)


def gather_take(table, idx, nb):
    S, R = table.shape
    B = idx.shape[0]
    return pl.pallas_call(
        take_kernel,
        grid=(B // nb,),
        in_specs=[
            pl.BlockSpec((S, R), lambda i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, nb), lambda i: (0, i), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec(
            (nb, R), lambda i: (i, 0), memory_space=pltpu.VMEM
        ),
        out_shape=jax.ShapeDtypeStruct((B, R), table.dtype),
    )(table, idx.reshape(1, B))


# D. plain advanced indexing inside the kernel
def brk_kernel(table_ref, idx_ref, out_ref):
    idx = idx_ref[0]
    out_ref[:] = table_ref[:][idx]


def gather_brk(table, idx, nb):
    S, R = table.shape
    B = idx.shape[0]
    return pl.pallas_call(
        brk_kernel,
        grid=(B // nb,),
        in_specs=[
            pl.BlockSpec((S, R), lambda i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, nb), lambda i: (0, i), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec(
            (nb, R), lambda i: (i, 0), memory_space=pltpu.VMEM
        ),
        out_shape=jax.ShapeDtypeStruct((B, R), table.dtype),
    )(table, idx.reshape(1, B))


# ---------------------------------------------------------------------------
# B. Serial dynamic-index row RMW (the scatter direction).
# ---------------------------------------------------------------------------
def rmw_kernel(idx_ref, rows_ref, out_ref):
    @pl.when(pl.program_id(0) == 0)
    def _():
        out_ref[:] = jnp.zeros_like(out_ref)

    nb = rows_ref.shape[0]

    def body(j, _):
        i = idx_ref[0, j]
        out_ref[pl.ds(i, 1), :] += rows_ref[pl.ds(j, 1), :]
        return 0

    jax.lax.fori_loop(0, nb, body, 0)


def scatter_rmw(idx, rows, S, nb):
    B, R = rows.shape
    return pl.pallas_call(
        rmw_kernel,
        grid=(B // nb,),
        in_specs=[
            pl.BlockSpec((1, nb), lambda i: (0, i), memory_space=pltpu.VMEM),
            pl.BlockSpec((nb, R), lambda i: (i, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec(
            (S, R), lambda i: (0, 0), memory_space=pltpu.VMEM
        ),
        out_shape=jax.ShapeDtypeStruct((S, R), rows.dtype),
    )(idx.reshape(1, B), rows)


# ---------------------------------------------------------------------------
# C. In-kernel one-hot MXU gather (baseline that surely compiles).
# ---------------------------------------------------------------------------
def onehot_kernel(table_ref, idx_ref, out_ref):
    idx = idx_ref[0]  # (NB,)
    nb = idx.shape[0]
    S = table_ref.shape[0]
    col = jax.lax.broadcasted_iota(jnp.int32, (nb, S), 1)
    oh = (col == idx[:, None]).astype(jnp.float32)
    out_ref[:] = jnp.dot(oh, table_ref[:], preferred_element_type=jnp.float32)


def gather_onehot(table, idx, nb):
    S, R = table.shape
    B = idx.shape[0]
    return pl.pallas_call(
        onehot_kernel,
        grid=(B // nb,),
        in_specs=[
            pl.BlockSpec((S, R), lambda i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, nb), lambda i: (0, i), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec(
            (nb, R), lambda i: (i, 0), memory_space=pltpu.VMEM
        ),
        out_shape=jax.ShapeDtypeStruct((B, R), table.dtype),
    )(table, idx.reshape(1, B))


# ---------------------------------------------------------------------------
# Correctness at small size
# ---------------------------------------------------------------------------
S0, R0, B0 = 512, 8, 1024
table0 = jnp.asarray(r.normal(size=(S0, R0)), jnp.float32)
idx0 = jnp.asarray(r.integers(0, S0, B0), jnp.int32)
ref_gather = np.asarray(table0)[np.asarray(idx0)]

for name, fn in [
    ("take   ", gather_take),
    ("brk    ", gather_brk),
    ("onehot ", gather_onehot),
]:
    try:
        got = np.asarray(fn(table0, idx0, 256))
        print(f"{name} maxerr: {np.abs(got - ref_gather).max()}", flush=True)
    except Exception as e:
        print(f"{name} correctness FAILED {type(e).__name__}: {str(e)[:300]}",
              flush=True)

rows0 = jnp.asarray(r.normal(size=(B0, R0)), jnp.float32)
ref_sc = np.zeros((S0, R0), np.float32)
np.add.at(ref_sc, np.asarray(idx0), np.asarray(rows0))
try:
    got = np.asarray(scatter_rmw(idx0, rows0, S0, 256))
    print(f"rmw     maxerr: {np.abs(got - ref_sc).max()}", flush=True)
except Exception as e:
    print(f"rmw     correctness FAILED {type(e).__name__}: {str(e)[:300]}",
          flush=True)

# ---------------------------------------------------------------------------
# Timing at flagship-relevant sizes: S=32768 table of 8 floats, B=2^18.
# ---------------------------------------------------------------------------
B = 2**18
for S in (4096, 32768):
    table = jnp.asarray(r.normal(size=(S, 8)), jnp.float32)
    idx = jnp.asarray(r.integers(0, S, B), jnp.int32)
    rows = jnp.asarray(r.normal(size=(B, 8)), jnp.float32)
    for nb in (512, 2048, 8192):
        timeit(f"S={S:6d} nb={nb:5d} take  ",
               functools.partial(gather_take, nb=nb), table, idx)
        timeit(f"S={S:6d} nb={nb:5d} rmw   ",
               lambda i_, v_, S=S, nb=nb: scatter_rmw(i_, v_, S, nb), idx,
               rows)
    timeit(f"S={S:6d} nb= 2048 onehot",
           functools.partial(gather_onehot, nb=2048), table, idx)
    # XLA reference points
    timeit(f"S={S:6d} xla gather      ",
           lambda t_, i_: t_.at[i_].get(mode="promise_in_bounds"), table, idx)
    timeit(
        f"S={S:6d} xla scatter     ",
        lambda i_, v_, S=S: jnp.zeros((S, 8), jnp.float32)
        .at[i_]
        .add(v_, mode="promise_in_bounds"),
        idx,
        rows,
    )
print("done", flush=True)
