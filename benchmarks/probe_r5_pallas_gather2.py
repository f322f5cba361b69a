#!/usr/bin/env python
"""Round-5 probe v2: hand Pallas gather kernels vs the XLA gather emitter
(VERDICT r4 item 1), fixing the v1 failures:

- v1's SMEM-windowed idx block exploded 128x (lane padding): a (2048,1)
  s32 window allocates 2 MB of the 1 MB SMEM. Fix: scalar-prefetch the
  WHOLE index vector once (PrefetchScalarGridSpec) — B=2^17 s32 = 512 KB.
- v1's blockspec_dma used a (1, F) table block (sublane dim 1 illegal);
  fix: view the table 3D (S, 8, F) [8x padded] so the block is (1, 8, F).

Variants (all gather B random rows of F f32 from an (S, F) table):
  V0  xla          — emitter baseline, promise_in_bounds
  V1p sp_serial    — table VMEM-resident, serial fori_loop, idx in SMEM
                     via scalar prefetch
  V2p sp_unroll8   — same, 8 loads per loop iteration (ILP)
  V3p bs_dma_k     — PrefetchScalarGridSpec BlockSpec-driven DMA: K table
                     inputs per grid step, each (1,8,F) block of the 8x
                     padded (S,8,F) view at row idx[K*g+k] (Mosaic
                     double-buffers across grid steps)
  V4p manual_dma   — table in ANY/HBM; per-row make_async_copy, G in
                     flight, idx via scalar prefetch
  V5  ds8          — UPPER BOUND control: one dynamic 8-consecutive-row
                     load per issue (table_ref[pl.ds(idx,8),:]) — what a
                     structured-corner (additive-hash) scheme could hit
  V6  fused_dot    — sp_serial gather + (TILE,F)x(F,128) MXU dot in the
                     same kernel (does gather+compute overlap?)

Usage: python benchmarks/probe_r5_pallas_gather2.py [--log-b 17]
       [--log-s 15] [--feat 8] [--only a,b] [--interpret]
"""

import argparse
import functools
import statistics
import sys
import time
from pathlib import Path

import numpy as np

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--log-b", type=int, default=17)
    ap.add_argument("--log-s", type=int, default=15)
    ap.add_argument("--feat", type=int, default=8)
    ap.add_argument("--reps", type=int, default=20)
    ap.add_argument("--only", default=None)
    ap.add_argument("--interpret", action="store_true",
                    help="CPU interpret mode (correctness only)")
    args = ap.parse_args()

    import jax

    if args.interpret:
        jax.config.update("jax_platforms", "cpu")
    jax.config.update(
        "jax_compilation_cache_dir",
        str(Path(__file__).resolve().parent.parent / ".jax_cache"),
    )
    import jax.numpy as jnp
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    INTERP = args.interpret
    B = 1 << args.log_b
    S = 1 << args.log_s
    F = args.feat

    r = np.random.default_rng(0)
    table = jnp.asarray(r.standard_normal((S, F)).astype(np.float32))
    idx = jnp.asarray(r.integers(0, S, (B,)).astype(np.int32))
    expected = np.asarray(table)[np.asarray(idx)]

    def timeit(fn, *xs, tag="", check=True):
        try:
            out = fn(*xs)
            _ = float(np.asarray(out).ravel()[0])
            if check and not np.allclose(np.asarray(out), expected):
                print(f"{tag}: WRONG RESULT", flush=True)
                return None
        except Exception as e:
            msg = str(e).replace("\n", " ")[:400]
            print(f"{tag}: FAILED {type(e).__name__}: {msg}", flush=True)
            return None
        if INTERP:
            print(f"{tag}: correct (interpret)", flush=True)
            return 0.0
        ms = []
        for _ in range(3):
            t0 = time.perf_counter()
            for _ in range(args.reps):
                out = fn(*xs)
            _ = float(out.ravel()[0])
            ms.append((time.perf_counter() - t0) / args.reps * 1e3)
        med = statistics.median(ms)
        print(
            f"{tag}: {med:.3f} ms = {med * 1e6 / B:.2f} ns/row "
            f"(blocks {[round(m, 3) for m in ms]})",
            flush=True,
        )
        return med

    want = set(args.only.split(",")) if args.only else None

    def sel(name):
        return want is None or name in want

    # ---- V0: XLA emitter baseline ----
    if sel("xla"):
        @jax.jit
        def xla_gather(t, i):
            return t.at[i].get(mode="promise_in_bounds")

        timeit(xla_gather, table, idx, tag="V0 xla_emitter")

    TILE = min(2048, B) if not INTERP else min(256, B)
    UNROLL = not INTERP  # full unroll traces too slowly in interpret mode
    n_tiles = B // TILE

    # ---- V1p: scalar-prefetch idx + VMEM table, serial loop ----
    if sel("sp_serial"):
        def k_sp(idx_ref, table_ref, out_ref):
            g = pl.program_id(0)
            base = g * TILE

            def body(i, _):
                out_ref[i, :] = table_ref[idx_ref[base + i], :]
                return 0

            jax.lax.fori_loop(0, TILE, body, 0, unroll=UNROLL)

        gs = pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=1,
            grid=(n_tiles,),
            in_specs=[
                pl.BlockSpec((S, F), lambda g, i_ref: (0, 0),
                             memory_space=pltpu.VMEM),
            ],
            out_specs=pl.BlockSpec((TILE, F), lambda g, i_ref: (g, 0),
                                   memory_space=pltpu.VMEM),
        )

        @jax.jit
        def sp_serial(t, i):
            return pl.pallas_call(
                k_sp, grid_spec=gs, interpret=INTERP,
                out_shape=jax.ShapeDtypeStruct((B, F), jnp.float32),
            )(i, t)

        timeit(sp_serial, table, idx, tag="V1p sp_serial")

    # ---- V2p: same, explicit 8-way unrolled python loop ----
    if sel("sp_unroll8"):
        def k_sp8(idx_ref, table_ref, out_ref):
            g = pl.program_id(0)
            base = g * TILE

            def body(i, _):
                b8 = i * 8
                for u in range(8):
                    out_ref[b8 + u, :] = table_ref[idx_ref[base + b8 + u], :]
                return 0

            jax.lax.fori_loop(0, TILE // 8, body, 0)

        gs8 = pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=1,
            grid=(n_tiles,),
            in_specs=[
                pl.BlockSpec((S, F), lambda g, i_ref: (0, 0),
                             memory_space=pltpu.VMEM),
            ],
            out_specs=pl.BlockSpec((TILE, F), lambda g, i_ref: (g, 0),
                                   memory_space=pltpu.VMEM),
        )

        @jax.jit
        def sp_unroll8(t, i):
            return pl.pallas_call(
                k_sp8, grid_spec=gs8, interpret=INTERP,
                out_shape=jax.ShapeDtypeStruct((B, F), jnp.float32),
            )(i, t)

        timeit(sp_unroll8, table, idx, tag="V2p sp_unroll8")

    # ---- V3p: BlockSpec-driven DMA, K rows per grid step ----
    if sel("bs_dma_k"):
        K = 16
        t3 = jnp.broadcast_to(table[:, None, :], (S, 8, F))

        def k_bs(idx_ref, *refs):
            out_ref = refs[K]
            for k in range(K):
                out_ref[k, 0, :] = refs[k][0, 0, :]

        gs3 = pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=1,
            grid=(B // K,),
            in_specs=[
                pl.BlockSpec(
                    (1, 8, F),
                    functools.partial(
                        lambda g, i_ref, k=0: (i_ref[g * K + k], 0, 0), k=k
                    ),
                    memory_space=pltpu.VMEM,
                )
                for k in range(K)
            ],
            out_specs=pl.BlockSpec((K, 1, F), lambda g, i_ref: (g, 0, 0),
                                   memory_space=pltpu.VMEM),
        )

        @jax.jit
        def bs_dma(t3_, i):
            out = pl.pallas_call(
                k_bs, grid_spec=gs3, interpret=INTERP,
                out_shape=jax.ShapeDtypeStruct((B, 1, F), jnp.float32),
            )(i, *([t3_] * K))
            return out.reshape(B, F)

        timeit(bs_dma, t3, idx, tag="V3p bs_dma_k16")

    # ---- V4p: manual per-row DMA from HBM, G rows in flight ----
    if sel("manual_dma"):
        G = 64 if not INTERP else 8
        TT4 = TILE

        def k_dma(idx_ref, table_hbm, out_ref):
            g = pl.program_id(0)
            base0 = g * TT4

            def inner(scratch, sems):
                def outer(w, _):
                    base = base0 + w * G

                    for u in range(G):
                        pltpu.make_async_copy(
                            table_hbm.at[pl.ds(idx_ref[base + u], 1), :],
                            scratch.at[pl.ds(u, 1), :],
                            sems.at[u],
                        ).start()
                    for u in range(G):
                        pltpu.make_async_copy(
                            table_hbm.at[pl.ds(idx_ref[base + u], 1), :],
                            scratch.at[pl.ds(u, 1), :],
                            sems.at[u],
                        ).wait()
                    out_ref[pl.ds(w * G, G), :] = scratch[:, :]
                    return 0

                jax.lax.fori_loop(0, TT4 // G, outer, 0)

            pl.run_scoped(
                inner,
                scratch=pltpu.VMEM((G, F), jnp.float32),
                sems=pltpu.SemaphoreType.DMA((G,)),
            )

        gs4 = pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=1,
            grid=(B // TT4,),
            in_specs=[pl.BlockSpec(memory_space=pl.ANY)],
            out_specs=pl.BlockSpec((TT4, F), lambda g, i_ref: (g, 0),
                                   memory_space=pltpu.VMEM),
        )

        @jax.jit
        def manual_dma(t, i):
            return pl.pallas_call(
                k_dma, grid_spec=gs4, interpret=INTERP,
                out_shape=jax.ShapeDtypeStruct((B, F), jnp.float32),
            )(i, t)

        timeit(manual_dma, table, idx, tag="V4p manual_dma")

    # ---- V5: ds8 — 8 consecutive rows per dynamic issue (upper bound
    # control for structured-corner schemes; NOT the same values) ----
    if sel("ds8"):
        def k_ds8(idx_ref, table_ref, out_ref):
            g = pl.program_id(0)
            base = g * TILE

            def body(i, _):
                out_ref[pl.ds(i * 8, 8), :] = table_ref[
                    pl.ds(idx_ref[base + i * 8], 8), :
                ]
                return 0

            jax.lax.fori_loop(0, TILE // 8, body, 0)

        gs5 = pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=1,
            grid=(n_tiles,),
            in_specs=[
                pl.BlockSpec((S, F), lambda g, i_ref: (0, 0),
                             memory_space=pltpu.VMEM),
            ],
            out_specs=pl.BlockSpec((TILE, F), lambda g, i_ref: (g, 0),
                                   memory_space=pltpu.VMEM),
        )
        idx5 = jnp.minimum(idx, S - 8)

        @jax.jit
        def ds8(t, i):
            return pl.pallas_call(
                k_ds8, grid_spec=gs5, interpret=INTERP,
                out_shape=jax.ShapeDtypeStruct((B, F), jnp.float32),
            )(i, t)

        timeit(ds8, table, idx5, tag="V5 ds8_consecutive", check=False)

    # ---- V6: gather + MXU dot fused in one kernel ----
    if sel("fused_dot"):
        w = jnp.asarray(r.standard_normal((F, 128)).astype(np.float32))

        def k_fused(idx_ref, table_ref, w_ref, out_ref, scratch):
            g = pl.program_id(0)
            base = g * TILE

            def body(i, _):
                scratch[i, :] = table_ref[idx_ref[base + i], :]
                return 0

            jax.lax.fori_loop(0, TILE, body, 0, unroll=UNROLL)
            out_ref[:, :] = jnp.dot(
                scratch[:, :], w_ref[:, :],
                preferred_element_type=jnp.float32,
            )

        gs6 = pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=1,
            grid=(n_tiles,),
            in_specs=[
                pl.BlockSpec((S, F), lambda g, i_ref: (0, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((F, 128), lambda g, i_ref: (0, 0),
                             memory_space=pltpu.VMEM),
            ],
            out_specs=pl.BlockSpec((TILE, 128), lambda g, i_ref: (g, 0),
                                   memory_space=pltpu.VMEM),
            scratch_shapes=[pltpu.VMEM((TILE, F), jnp.float32)],
        )

        @jax.jit
        def fused_dot(t, i, ww):
            return pl.pallas_call(
                k_fused, grid_spec=gs6, interpret=INTERP,
                out_shape=jax.ShapeDtypeStruct((B, 128), jnp.float32),
            )(i, t, ww)

        timeit(fused_dot, table, idx, w, tag="V6 fused_dot", check=False)

    print("done", flush=True)


if __name__ == "__main__":
    main()
