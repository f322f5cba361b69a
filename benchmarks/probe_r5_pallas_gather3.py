#!/usr/bin/env python
"""Round-5 probe 3: WHERE do the ~14 cycles/row of the in-kernel Pallas
gather go (probe 2: serial = unroll8 = 15 ns/row; XLA standalone 15,
XLA composed 1.8-4.5)? Bound isolation + alternative formulations.

All variants process B rows of F f32 from an (S, F) VMEM-resident table.

  C0 static_copy   — control: COPY loop, static row index (i -> i). Pure
                     loop + per-row load/store cost, no dynamic address.
  C1 load_only     — dynamic loads, accumulate into one vreg, single
                     store per tile (isolates dynamic-load throughput).
  C2 store_only    — static loads (row i), dynamic stores to out[idx[i]]
                     (isolates dynamic-store cost; values wrong, timing
                     only).
  C3 ds8_aligned   — dynamic ALIGNED vreg loads (idx & ~7, 8 rows) +
                     8-row store (is sublane misalignment the cost?).
  C4 two_stream    — two interleaved gathers from two tables (cross-
                     stream ILP the unroll8 test may have missed due to
                     same-table port conflicts).
  C5 dyngather_sel — tpu.dynamic_gather select-tree: table TRANSPOSED
                     (F, S); for each 128-index vreg iterate S/128 lane
                     blocks: broadcast idx, dynamic_gather along lanes,
                     select by block id. O(S/128) vector ops per 128
                     rows — wins only for small S; measure S=2^10, 2^15.
  C6 onehot_mxu    — one-hot MXU gather for SMALL tables: idx -> one-hot
                     (TILE, S) bf16 @ table (S, F) f32. 2*S*F FLOPs/row.
                     S=2^10: 16 KFLOP/row ~ 0.08 ns at roofline.

Usage: python benchmarks/probe_r5_pallas_gather3.py [--log-b 17] [--only ...]
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
    ap.add_argument("--interpret", action="store_true")
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
    TILE = min(2048, B) if not INTERP else min(256, B)
    n_tiles = B // TILE

    r = np.random.default_rng(0)
    table = jnp.asarray(r.standard_normal((S, F)).astype(np.float32))
    idx = jnp.asarray(r.integers(0, S, (B,)).astype(np.int32))
    expected = np.asarray(table)[np.asarray(idx)]

    def timeit(fn, *xs, tag="", check=None):
        try:
            out = fn(*xs)
            _ = float(np.asarray(out).ravel()[0])
            if check is not None and not np.allclose(
                np.asarray(out), check
            ):
                print(f"{tag}: WRONG RESULT", flush=True)
                return None
        except Exception as e:
            msg = str(e).replace("\n", " ")[:300]
            print(f"{tag}: FAILED {type(e).__name__}: {msg}", flush=True)
            return None
        if INTERP:
            print(f"{tag}: ran (interpret)", flush=True)
            return 0.0
        ms = []
        for _ in range(3):
            t0 = time.perf_counter()
            for _ in range(args.reps):
                out = fn(*xs)
            _ = float(out.ravel()[0])  # scalar sync — NEVER np.asarray
            # (a full fetch over the tunnel costs ~ms and poisons timing)
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

    def sp_spec(n_extra_vmem=0, out_shape=None, scratch=None):
        in_specs = [
            pl.BlockSpec((S, F), lambda g, i_ref: (0, 0),
                         memory_space=pltpu.VMEM)
        ]
        for _ in range(n_extra_vmem):
            in_specs.append(
                pl.BlockSpec((S, F), lambda g, i_ref: (0, 0),
                             memory_space=pltpu.VMEM)
            )
        return pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=1,
            grid=(n_tiles,),
            in_specs=in_specs,
            out_specs=pl.BlockSpec(
                out_shape or (TILE, F), lambda g, i_ref: (g, 0),
                memory_space=pltpu.VMEM,
            ),
            scratch_shapes=scratch or [],
        )

    # ---- C0: static copy loop ----
    if sel("static_copy"):
        def k0(idx_ref, t_ref, o_ref):
            def body(i, _):
                o_ref[i, :] = t_ref[i, :]
                return 0
            jax.lax.fori_loop(0, TILE, body, 0, unroll=not INTERP)

        @jax.jit
        def static_copy(t, i):
            return pl.pallas_call(
                k0, grid_spec=sp_spec(), interpret=INTERP,
                out_shape=jax.ShapeDtypeStruct((B, F), jnp.float32),
            )(i, t)

        timeit(static_copy, table, idx, tag="C0 static_copy")

    # ---- C1: dynamic loads only (accumulate) ----
    if sel("load_only"):
        def k1(idx_ref, t_ref, o_ref):
            g = pl.program_id(0)
            base = g * TILE

            def body(i, acc):
                return acc + t_ref[idx_ref[base + i], :]
            acc = jax.lax.fori_loop(
                0, TILE, body, jnp.zeros((F,), jnp.float32),
                unroll=not INTERP,
            )
            o_ref[0, :] = acc

        @jax.jit
        def load_only(t, i):
            return pl.pallas_call(
                k1, grid_spec=sp_spec(out_shape=(8, F)), interpret=INTERP,
                out_shape=jax.ShapeDtypeStruct((n_tiles * 8, F),
                                               jnp.float32),
            )(i, t)

        timeit(load_only, table, idx, tag="C1 load_only")

    # ---- C2: dynamic stores only ----
    if sel("store_only"):
        def k2(idx_ref, t_ref, o_ref):
            g = pl.program_id(0)
            base = g * TILE

            def body(i, _):
                o_ref[idx_ref[base + i] % TILE, :] = t_ref[i, :]
                return 0
            jax.lax.fori_loop(0, TILE, body, 0, unroll=not INTERP)

        @jax.jit
        def store_only(t, i):
            return pl.pallas_call(
                k2, grid_spec=sp_spec(), interpret=INTERP,
                out_shape=jax.ShapeDtypeStruct((B, F), jnp.float32),
            )(i, t)

        timeit(store_only, table, idx, tag="C2 store_only")

    # ---- C3: aligned 8-row dynamic loads ----
    if sel("ds8_aligned"):
        def k3(idx_ref, t_ref, o_ref):
            g = pl.program_id(0)
            base = g * TILE

            def body(i, _):
                a = (idx_ref[base + i * 8] // 8) * 8
                o_ref[pl.ds(i * 8, 8), :] = t_ref[pl.ds(a, 8), :]
                return 0
            jax.lax.fori_loop(0, TILE // 8, body, 0, unroll=not INTERP)

        @jax.jit
        def ds8_aligned(t, i):
            return pl.pallas_call(
                k3, grid_spec=sp_spec(), interpret=INTERP,
                out_shape=jax.ShapeDtypeStruct((B, F), jnp.float32),
            )(i, t)

        timeit(ds8_aligned, table, idx, tag="C3 ds8_aligned")

    # ---- C4: two interleaved streams from two tables ----
    if sel("two_stream"):
        table2 = table + 1.0

        def k4(idx_ref, t_ref, t2_ref, o_ref):
            g = pl.program_id(0)
            base = g * TILE

            def body(i, _):
                j = i * 2
                o_ref[j, :] = t_ref[idx_ref[base + j], :]
                o_ref[j + 1, :] = t2_ref[idx_ref[base + j + 1], :]
                return 0
            jax.lax.fori_loop(0, TILE // 2, body, 0, unroll=not INTERP)

        @jax.jit
        def two_stream(t, t2, i):
            return pl.pallas_call(
                k4, grid_spec=sp_spec(n_extra_vmem=1), interpret=INTERP,
                out_shape=jax.ShapeDtypeStruct((B, F), jnp.float32),
            )(i, t, t2)

        timeit(two_stream, table, table2, idx, tag="C4 two_stream")

    # ---- C5: dynamic_gather select-tree (transposed table) ----
    if sel("dyngather_sel"):
        for logS2 in (10, args.log_s):
            S2 = 1 << logS2
            t_t = jnp.asarray(
                np.ascontiguousarray(np.asarray(table)[:S2].T)
            )  # (F, S2)
            idx2 = jnp.asarray(
                (np.asarray(idx) % S2).astype(np.int32)
            )
            exp2 = np.asarray(table)[:S2][np.asarray(idx2)]
            n_blocks = S2 // 128

            # Formulation: idx as a VMEM (TILE//128, 128) i32 block; for
            # each 128-column lane block of the transposed (F, S2) table,
            # jnp.take each feature's 128-lane row with the index vector
            # (lowers to tpu.dynamic_gather within a vreg), select where
            # the index falls in this block. O(S2/128 * F) vector ops per
            # (TILE//128, 128) index block.
            R8 = TILE // 128

            def k5b(i_ref, tt_ref, o_ref):
                idxv = i_ref[...]  # (R8, 128) i32
                # Per-feature accumulators as separate arrays (static
                # python indexing — .at[].set would lower to an
                # unsupported in-kernel scatter).
                accs = [jnp.zeros((R8, 128), jnp.float32)] * F
                for b in range(n_blocks):
                    blk = tt_ref[:, b * 128 : (b + 1) * 128]  # (F, 128)
                    local = idxv - b * 128
                    inb = (local >= 0) & (local < 128)
                    li = jnp.where(inb, local, 0)
                    for f in range(F):
                        # 2D in-vreg lane gather (tpu.dynamic_gather):
                        # out[r, l] = row[li[r, l]].
                        row2 = jnp.broadcast_to(
                            blk[f, :][None, :], li.shape
                        )
                        g = jnp.take_along_axis(row2, li, axis=1)
                        accs[f] = jnp.where(inb, g, accs[f])
                # Feature-major output planes (static slices, no
                # in-kernel reshape): out[f*R8 + r, l] = feature f of
                # sample r*128 + l.
                for f in range(F):
                    o_ref[f * R8 : (f + 1) * R8, :] = accs[f]

            @jax.jit
            def dyn_sel(tt, ii):
                return pl.pallas_call(
                    k5b,
                    grid=(n_tiles,),
                    in_specs=[
                        pl.BlockSpec((R8, 128), lambda g: (g, 0),
                                     memory_space=pltpu.VMEM),
                        pl.BlockSpec((F, S2), lambda g: (0, 0),
                                     memory_space=pltpu.VMEM),
                    ],
                    out_specs=pl.BlockSpec(
                        (F * R8, 128), lambda g: (g, 0),
                        memory_space=pltpu.VMEM,
                    ),
                    out_shape=jax.ShapeDtypeStruct(
                        (n_tiles * F * R8, 128), jnp.float32
                    ),
                    interpret=INTERP,
                )(ii.reshape(B // 128, 128), tt)

            # expected in the plane layout: tile t, feature f, row r,
            # lane l <-> sample t*TILE + r*128 + l.
            exp5 = (
                exp2.reshape(n_tiles, R8, 128, F)
                .transpose(0, 3, 1, 2)
                .reshape(n_tiles * F * R8, 128)
            )
            timeit(dyn_sel, t_t, idx2,
                   tag=f"C5 dyngather_sel_S2^{logS2}", check=exp5)

    # ---- C6: one-hot MXU gather (small table) ----
    if sel("onehot_mxu"):
        S3 = 1 << 10
        t3 = table[:S3]
        idx3 = jnp.asarray((np.asarray(idx) % S3).astype(np.int32))
        exp3 = np.asarray(table)[:S3][np.asarray(idx3)]

        def k6(i_ref, t_ref, o_ref):
            idxv = i_ref[...]  # (TILE, 1)
            cols = jax.lax.broadcasted_iota(
                jnp.int32, (TILE, S3), dimension=1
            )
            onehot = (cols == idxv).astype(jnp.bfloat16)
            o_ref[...] = jax.lax.dot_general(
                onehot, t_ref[...].astype(jnp.bfloat16),
                (((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32,
            )

        @jax.jit
        def onehot_mxu(t, ii):
            return pl.pallas_call(
                k6,
                grid=(n_tiles,),
                in_specs=[
                    pl.BlockSpec((TILE, 1), lambda g: (g, 0),
                                 memory_space=pltpu.VMEM),
                    pl.BlockSpec((S3, F), lambda g: (0, 0),
                                 memory_space=pltpu.VMEM),
                ],
                out_specs=pl.BlockSpec(
                    (TILE, F), lambda g: (g, 0), memory_space=pltpu.VMEM
                ),
                out_shape=jax.ShapeDtypeStruct((B, F), jnp.float32),
                interpret=INTERP,
            )(ii.reshape(B, 1), t)

        # bf16 one-hot x bf16 table -> f32: table bf16-truncated; check
        # against bf16 expectation loosely.
        timeit(onehot_mxu, t3, idx3, tag="C6 onehot_mxu_S2^10")

    print("done", flush=True)


if __name__ == "__main__":
    main()
