#!/usr/bin/env python
"""Windowed fine-level probe, take 2: PACKED 128-lane windows.

probe_window.py's negative result came from slicing the UNPACKED
(S, 16)-narrow quad table: every (W, 16) window pads 16 -> 128 lanes, an
8x traffic amplification (its 8.3 ms "slices only" is exactly
bandwidth-bound on the padded bytes). This probe re-tests the windowed
design on the lane-packed (S/K, 128) table where windows are compact,
and uses direct lax.gather / lax.scatter_add slab forms (the old probe's
vmapped dynamic_slice may also have lowered badly).

Design: with raster-additive strides + run-correlated stratified jitter,
each x-run of GSZ consecutive samples touches one contiguous window of
W packed rows starting at a per-run offset r0[g]:
  fwd:  slab-gather (G, W, 128) windows + per-sample row one-hot einsum
        (MXU) + K-cell select (elementwise, as the packed path).
  bwd:  one-hot^T einsum -> (G, W, 128) window grads + slab scatter-add.

Shapes: 3D NeRF fine level (S=2^19 cells, K=8 -> Sp=2^16 packed rows,
B=2^18, G=4096 runs of 64, window 128 rows = 1024 cells) and 2D flagship
fine level (S=2^15, K=16 -> Sp=2048, B=2^18, G=512 runs of 512,
W in {64, 512} for mid/finest levels).

Run ON TPU: python -u benchmarks/probe_window2.py > _probe_window2.txt 2>&1
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
from jax import lax  # noqa: E402

PIB = lax.GatherScatterMode.PROMISE_IN_BOUNDS


def run(name, fn, *args, reps=20):
    t0 = time.time()
    c = jax.jit(fn).lower(*args).compile()
    compile_s = time.time() - t0
    out = c(*args)
    _ = float(jax.tree_util.tree_leaves(out)[0].ravel()[0])
    t0 = time.perf_counter()
    for _i in range(reps):
        out = c(*args)
    _ = float(jax.tree_util.tree_leaves(out)[0].ravel()[0])
    ms = (time.perf_counter() - t0) / reps * 1e3
    print(f"{name}: {ms:7.3f} ms  (compile {compile_s:.0f}s)", flush=True)
    return ms


def slab_gather(table, starts, w):
    dn = lax.GatherDimensionNumbers(
        offset_dims=(1, 2), collapsed_slice_dims=(), start_index_map=(0,)
    )
    return lax.gather(
        table, starts[:, None], dn, slice_sizes=(w, table.shape[1]),
        mode=PIB,
    )  # (G, W, L)


def slab_scatter_add(size, starts, updates):
    dn = lax.ScatterDimensionNumbers(
        update_window_dims=(1, 2),
        inserted_window_dims=(),
        scatter_dims_to_operand_dims=(0,),
    )
    return lax.scatter_add(
        jnp.zeros((size, updates.shape[2]), updates.dtype),
        starts[:, None], updates, dn, mode=PIB,
    )


def bench_config(tag, s_cells, k, b, gsz, w, span_cells):
    sp = s_cells // k
    g = b // gsz
    print(f"-- {tag}: Sp={sp} W={w} G={g} GSZ={gsz}", flush=True)
    r = np.random.default_rng(0)
    table = jnp.asarray(r.normal(0, 1, (sp + w, 128)).astype(np.float32))
    table16 = table.astype(jnp.bfloat16)
    rows = jnp.asarray(
        r.normal(0, 1, (b, 128)).astype(np.float32), jnp.bfloat16
    )
    starts = jnp.asarray(r.integers(0, sp, g).astype(np.int32))
    span_rows = max(1, span_cells // k)
    local = jnp.asarray(
        np.minimum(
            r.integers(0, span_rows + 1, (g, gsz)), w - 1
        ).astype(np.int32)
    )
    gidx = (starts[:, None] + local).reshape(-1)  # (B,) packed-row indices

    # baselines: what the packed path does today
    run("  base row-gather f32", lambda t, i: t.at[i].get(mode="promise_in_bounds").sum(), table, gidx)
    run("  base row-gather bf16", lambda t, i: t.at[i].get(mode="promise_in_bounds").sum(), table16, gidx)
    run(
        "  base row-scatter bf16",
        lambda rws, i: jnp.zeros((sp + w, 128), jnp.bfloat16)
        .at[i]
        .add(rws, mode="promise_in_bounds")
        .astype(jnp.float32)
        .sum(),
        rows, gidx,
    )

    # windows alone: slab gather via lax.gather vs vmapped dynamic_slice
    run("  win slab-gather f32", lambda t, s: slab_gather(t, s, w).sum(), table, starts)
    run("  win slab-gather bf16", lambda t, s: slab_gather(t, s, w).astype(jnp.float32).sum(), table16, starts)
    run(
        "  win vmap-dynslice bf16",
        lambda t, s: jax.vmap(
            lambda s0: lax.dynamic_slice(t, (s0, 0), (w, 128))
        )(s).astype(jnp.float32).sum(),
        table16, starts,
    )

    # fwd composed: slab gather + row-select einsum (MXU)
    def fwd(t, s, loc):
        win = slab_gather(t, s, w)  # (G, W, 128)
        iota = lax.broadcasted_iota(jnp.int32, (g, gsz, w), 2)
        oh = (loc[:, :, None] == iota).astype(jnp.bfloat16)
        feats = jnp.einsum(
            "gbw,gwl->gbl", oh, win.astype(jnp.bfloat16),
            preferred_element_type=jnp.float32,
        )
        return feats.sum()

    run("  fwd win+onehot f32tab", fwd, table, starts, local)
    run("  fwd win+onehot bf16tab", fwd, table16, starts, local)

    # bwd composed: onehot^T einsum -> window grads -> slab scatter-add
    def bwd(rws, s, loc):
        iota = lax.broadcasted_iota(jnp.int32, (g, gsz, w), 2)
        oh = (loc[:, :, None] == iota).astype(jnp.bfloat16)
        wg = jnp.einsum(
            "gbw,gbl->gwl", oh, rws.reshape(g, gsz, 128),
            preferred_element_type=jnp.float32,
        ).astype(jnp.bfloat16)
        out = slab_scatter_add(sp + w, s, wg)
        return out.astype(jnp.float32).sum()

    run("  bwd onehotT+slab-scatter", bwd, rows, starts, local)

    # autodiff round trip: grad wrt table of (fwd select)^2 — checks the
    # transpose XLA derives for the slab gather (should be slab scatter)
    def fwd_loss(t, s, loc):
        win = slab_gather(t, s, w)
        iota = lax.broadcasted_iota(jnp.int32, (g, gsz, w), 2)
        oh = (loc[:, :, None] == iota).astype(t.dtype)
        feats = jnp.einsum(
            "gbw,gwl->gbl", oh, win, preferred_element_type=jnp.float32
        )
        return (feats * feats).sum()

    run(
        "  fwd+bwd autodiff f32tab",
        lambda t, s, loc: jax.grad(fwd_loss)(t, s, loc).sum(),
        table, starts, local,
    )


def main():
    print("backend:", jax.default_backend(), flush=True)
    # 3D NeRF fine level: res~686, strata 64 -> span/run = 64*(686/64)=686
    bench_config("3D fine", 2**19, 8, 2**18, 64, 128, 686)
    # 2D flagship mid-fine level (res 615, strata 512): span/run = 615
    bench_config("2D l9", 2**15, 16, 2**18, 512, 64, 615)
    # 2D flagship finest level (res 7005): span/run = 7005 cells
    bench_config("2D l15", 2**15, 16, 2**18, 512, 512, 7005)


if __name__ == "__main__":
    main()
