"""Round-4 probe (VERDICT r3 next-3): walk the <=2^17-row slice-split path
to the VMEM-resident scatter kernels on real shapes.

Three questions, all on the v5e:

1. Does `scatter_rows_factored_pallas` (strips + one-hots as VMEM
   transients) COMPILE at the 3D fine-level shape (S=2^19, B=2^18) once
   the batch is sliced into <=2^17-row kernel calls (max_rows default)?
   Round 2 documented the slice workaround for the remote-compile
   HTTP-500 envelope but never ran it at this shape. Speed is expected
   to be FLOPs-bound (~2*B*S*R bf16 MACs ~ 4.4 TFLOP -> >=22 ms: the
   factored form is mathematically FLOPs-prohibitive at S=2^19 —
   hierarchical/two-stage one-hot factorizations do NOT reduce MACs,
   because the one-hot operand is dense regardless of nesting; only
   physical row grouping would, and the sort it needs was measured dead
   in round 1: argsort 4.7 ms + take 6 ms > the 5.8 ms emitter it would
   replace). The point is proving the sliced form compiles and measuring
   it honestly.

2. Does `scatter_rows_serial` (true VMEM-resident accumulator,
   dynamic-index row RMW) compile at the 2D flagship fine-level shape
   (S=2^15, R=8 -> 1 MB table in VMEM) with sliced batches? Round 1
   recorded the RMW kernel crashing the remote compiler "at useful
   sizes" pre-slicing. If it compiles AND beats the 2.3 ms factored
   matmul, it replaces the 2D fine-level scatter outright.

3. The two red smoke canaries' kernels (factored_kernel /
   factored_kernel_sr) at the EXACT smoke-gate shape (B=2048 padded to
   8192, S=4096): they sit far below the slice envelope, so their 500s
   are either service flake or a shape-specific Mosaic bug — measure
   pass/fail across kernel-parameter variants (sub/n_sub/unroll) to
   separate the two.

Usage: python benchmarks/probe_r4_sliced.py > benchmarks/logs/_r4_sliced.txt
"""

import sys
import time
from pathlib import Path

import jax

jax.config.update(
    "jax_compilation_cache_dir",
    str(Path(__file__).resolve().parent.parent / ".jax_cache"),
)
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

import jax.numpy as jnp
import numpy as np

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

from tcnn_tpu.ops.scatter_rows import (  # noqa: E402
    scatter_rows_factored,
    scatter_rows_factored_pallas,
    scatter_rows_serial,
)


def sync(x):
    return float(jnp.asarray(x).ravel()[0])


def timed(fn, *args, reps=20, warmup=3):
    f = jax.jit(fn)
    for _ in range(warmup):
        out = f(*args)
    sync(out)
    t0 = time.perf_counter()
    for _ in range(reps):
        out = f(*args)
    sync(out)
    return (time.perf_counter() - t0) / reps * 1e3, out


def try_case(name, fn, *args, reps=20):
    try:
        ms, out = timed(fn, *args, reps=reps)
        print(f"OK   {name}: {ms:.3f} ms", flush=True)
        return ms, out
    except Exception as e:
        print(f"FAIL {name}: {type(e).__name__}: {str(e)[:300]}", flush=True)
        return None, None


def main():
    print(f"backend={jax.default_backend()}", flush=True)
    rng = np.random.default_rng(0)

    # --- Q2: serial RMW kernel at the 2D flagship fine-level shape ------
    S2, B2, R2 = 2**15, 2**18, 8
    idx2 = jnp.asarray(rng.integers(0, S2, B2), jnp.int32)
    rows2 = jnp.asarray(rng.normal(0, 1, (B2, R2)), jnp.float32)

    ms_ref, ref = try_case(
        "2D factored pair (current default)",
        lambda i, r: scatter_rows_factored(i, r, S2), idx2, rows2,
    )
    for mr in (2**17, 2**16):
        ms_ser, got = try_case(
            f"2D serial RMW VMEM (slices of {mr})",
            lambda i, r, mr=mr: scatter_rows_serial(i, r, S2, max_rows=mr),
            idx2, rows2, reps=5,
        )
        if got is not None and ref is not None:
            err = float(
                jnp.max(jnp.abs(got - ref)) / (jnp.max(jnp.abs(ref)) + 1e-9)
            )
            print(f"     rel vs factored-pair: {err:.2e}", flush=True)
        if ms_ser is not None:
            break

    # --- Q1: sliced factored kernel at the 3D fine-level shape ----------
    S3, B3, R3 = 2**19, 2**18, 16
    idx3 = jnp.asarray(rng.integers(0, S3, B3), jnp.int32)
    rows3 = jnp.asarray(rng.normal(0, 1, (B3, R3)), jnp.float32)

    try_case(
        "3D xla bf16 emitter (current non-locked default)",
        lambda i, r: jnp.zeros((S3, R3), jnp.bfloat16)
        .at[i]
        .add(r.astype(jnp.bfloat16), mode="promise_in_bounds")
        .astype(jnp.float32),
        idx3, rows3,
    )
    try_case(
        "3D factored_kernel sliced (2 x 2^17)",
        lambda i, r: scatter_rows_factored_pallas(i, r, S3, rounding="single"),
        idx3, rows3, reps=3,
    )

    # --- Q3: canary kernels at the smoke-gate shape ----------------------
    Sc, Bc, Rc = 4096, 2048, 8
    idxc = jnp.asarray(rng.integers(0, Sc, Bc), jnp.int32)
    rowsc = jnp.asarray(rng.normal(0, 1, (Bc, Rc)), jnp.float32)
    refc = np.zeros((Sc, Rc), np.float64)
    np.add.at(refc, np.asarray(idxc), np.asarray(rowsc, np.float64))
    for rounding in ("pair", "sr"):
        for sub, n_sub, unroll in (
            (1024, 8, True),   # the shipped default = the red canary
            (1024, 8, False),
            (256, 8, True),
            (1024, 2, True),
        ):
            ms, got = try_case(
                f"canary {rounding} sub={sub} n_sub={n_sub} unroll={unroll}",
                lambda i, r, rd=rounding, s=sub, n=n_sub, u=unroll:
                scatter_rows_factored_pallas(
                    i, r, Sc, rounding=rd, sub=s, n_sub=n, unroll=u
                ),
                idxc, rowsc, reps=5,
            )
            if got is not None:
                err = float(
                    np.abs(np.asarray(got, np.float64) - refc).max()
                    / (np.abs(refc).max() + 1e-9)
                )
                print(f"     rel vs dense np: {err:.2e}", flush=True)

    print("DONE", flush=True)


if __name__ == "__main__":
    main()
