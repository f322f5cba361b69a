#!/usr/bin/env python
"""Lane-packed quad-table path — single fine level (the 37 GB fix).

HLO traffic analysis (probe_3d_hlo.py) showed the composed encoding
backward materializes 37.25 GB/step vs 2.56 GB for the same scatters
standalone: the quad table's roll adjoints produce (S,2)-narrow arrays in
a 64x lane-padded layout, and the (S,16) scatter output/cast pads 8x.

Candidate fix measured here: build the quad table PACKED as (S/8, 128)
(8 cells x 16 features per physical row) from flat 1D rolls of the level's
parameter slice — every intermediate has a 128-multiple minor dim, so all
layouts are compact. Gather fetches (B, 128) rows by idx>>3 and selects
the 16-lane cell slot via an 8-way one-hot; the backward then scatters
compact (B,128) rows and takes flat-1D roll adjoints.

Run ON TPU: python -u benchmarks/probe_packed.py > _probe_packed.txt 2>&1
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

from tcnn_tpu.ops.scatter_rows import gather_rows  # noqa: E402

S = 2**19          # level size (quad rows / cells)
B = 2**18
D = 3
C = 2**D           # corners
F = 2
SLOT = C * F       # 16 lanes per cell
K = 128 // SLOT    # 8 cells per packed row
S8 = S // K

# additive-hash corner deltas for a fine hashed level (scale ~686)
P1 = 689
DELTAS = []
for cbits in range(C):
    d0 = (cbits >> 0) & 1
    d1 = (cbits >> 1) & 1
    d2 = (cbits >> 2) & 1
    DELTAS.append((d0 * 1 + d1 * P1 + d2 * P1 * P1) % S)


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
    return out


def quad_current(sl, idx, w):
    """Today's path: (S,2) rolls -> concat -> (S,16) gather."""
    cols = [jnp.roll(sl, -dlt, axis=0) if dlt else sl for dlt in DELTAS]
    quad = jnp.concatenate(cols, axis=1)                     # (S, 16)
    feats = gather_rows(quad, idx, "xla_half")               # (B, 16)
    feats = feats.reshape(B, C, F)
    return jnp.sum(feats * w[..., None], axis=1)             # (B, F)


def quad_packed(flat, idx, w):
    """Packed path: flat rolls -> (S/8,128) table, slot select."""
    rolls = [
        (jnp.roll(flat, -F * dlt) if dlt else flat).reshape(S8, K, F)
        for dlt in DELTAS
    ]
    q = jnp.stack(rolls, axis=2).reshape(S8, 128)            # (S/8, 128)
    g = gather_rows(q, idx // K, "xla_half")                 # (B, 128)
    g = g.reshape(B, K, C, F)
    sel = jax.nn.one_hot(idx % K, K, dtype=g.dtype)          # (B, K)
    feats = jnp.einsum("bk,bkcf->bcf", sel, g)               # (B, C, F)
    return jnp.sum(feats * w[..., None], axis=1)


def quad_packed_cm(flat, idx, w):
    """Corner-major packing: Q = lane-concat of 8 reshaped flat rolls.

    Q[i, 16c+2k+f] = flat[16i+2k+2*delta_c+f] = sl[8i+k+delta_c, f], so the
    build is concat([roll(flat,-2*d_c).reshape(S/8,16) for c], axis=1) —
    no interleave, one fusable loop writing a compact (S/8,128) array.
    Slot select picks cell k=idx%8 from each 16-lane corner block.
    """
    rolls = [
        (jnp.roll(flat, -F * dlt) if dlt else flat).reshape(S8, K * F)
        for dlt in DELTAS
    ]
    q = jnp.concatenate(rolls, axis=1)                       # (S/8, 128)
    g = gather_rows(q, idx // K, "xla_half")                 # (B, 128)
    g = g.reshape(B, C, K, F)
    sel = jax.nn.one_hot(idx % K, K, dtype=g.dtype)          # (B, K)
    feats = jnp.einsum("bk,bckf->bcf", sel, g)               # (B, C, F)
    return jnp.sum(feats * w[..., None], axis=1)


def quad_packed_fused(flat, idx, w):
    """Corner-major packed gather with the slot-select folded into the
    weight combine: one fused reduce (B,128)->(B,F), no (B,C,F) feats."""
    rolls = [
        (jnp.roll(flat, -F * dlt) if dlt else flat).reshape(S8, K * F)
        for dlt in DELTAS
    ]
    q = jnp.concatenate(rolls, axis=1)
    g = gather_rows(q, idx // K, "xla_half")                 # (B, 128)
    g = g.reshape(B, C, K, F)
    sel = jax.nn.one_hot(idx % K, K, dtype=g.dtype)          # (B, K)
    wk = w[:, :, None] * sel[:, None, :]                     # (B, C, K)
    return jnp.sum(g * wk[..., None], axis=(1, 2))           # (B, F)


def main():
    print("backend:", jax.default_backend(), flush=True)
    r = np.random.default_rng(0)
    sl = jnp.asarray(r.normal(0, 1, (S, F)).astype(np.float32))
    flat = sl.reshape(-1)
    idx = jnp.asarray(r.integers(0, S, B).astype(np.int32))
    w = jnp.asarray(r.uniform(0, 1, (B, C)).astype(np.float32))

    y0 = jax.jit(quad_current)(sl, idx, w)
    ycm = jax.jit(quad_packed_cm)(flat, idx, w)
    print("fwd parity (corner-major):", float(jnp.max(jnp.abs(y0 - ycm))),
          flush=True)
    gcm = jax.jit(jax.grad(lambda f: (quad_packed_cm(f, idx, w) ** 2).sum()))(
        flat)
    g0 = jax.jit(jax.grad(lambda s: (quad_current(s, idx, w) ** 2).sum()))(sl)
    print("bwd parity (corner-major):",
          float(jnp.max(jnp.abs(g0.reshape(-1) - gcm))), flush=True)

    run("fwd packed-cm", lambda f: quad_packed_cm(f, idx, w).sum(), flat)
    run("bwd packed-cm",
        jax.grad(lambda f: (quad_packed_cm(f, idx, w) ** 2).sum()), flat)

    yf = jax.jit(quad_packed_fused)(flat, idx, w)
    y0 = jax.jit(quad_current)(
        flat.reshape(S, F), idx, w)
    print("fused-select parity:", float(jnp.max(jnp.abs(y0 - yf))), flush=True)
    run("fwd packed-fused", lambda f: quad_packed_fused(f, idx, w).sum(), flat)
    run("bwd packed-fused",
        jax.grad(lambda f: (quad_packed_fused(f, idx, w) ** 2).sum()), flat)

    # numerics parity (small slice)
    y0 = jax.jit(quad_current)(sl, idx, w)
    y1 = jax.jit(quad_packed)(flat, idx, w)
    err = float(jnp.max(jnp.abs(y0 - y1)))
    print("fwd parity max abs err:", err, flush=True)

    g0 = jax.jit(jax.grad(lambda s: (quad_current(s, idx, w) ** 2).sum()))(sl)
    g1 = jax.jit(jax.grad(lambda f: (quad_packed(f, idx, w) ** 2).sum()))(flat)
    gerr = float(jnp.max(jnp.abs(g0.reshape(-1) - g1)))
    rel = gerr / (float(jnp.max(jnp.abs(g0))) + 1e-9)
    print("bwd parity max abs err:", gerr, "rel:", rel, flush=True)

    run("fwd current", lambda s: quad_current(s, idx, w).sum(), sl)
    run("fwd packed ", lambda f: quad_packed(f, idx, w).sum(), flat)
    run("bwd current", jax.grad(lambda s: (quad_current(s, idx, w) ** 2).sum()), sl)
    run("bwd packed ", jax.grad(lambda f: (quad_packed(f, idx, w) ** 2).sum()), flat)

    # scatter-only packed baseline
    rows = jnp.asarray(r.normal(0, 1, (B, 128)).astype(np.float32),
                       jnp.bfloat16)
    i8 = idx // K

    def scat(rows, i8):
        return (
            jnp.zeros((S8, 128), jnp.bfloat16)
            .at[i8]
            .add(rows, mode="promise_in_bounds")
        ).astype(jnp.float32).sum()

    run("scatter packed (B,128)->(S/8,128)", scat, rows, i8)


if __name__ == "__main__":
    main()
