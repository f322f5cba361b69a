#!/usr/bin/env python
"""Locked-backward gradient assembly forms at the 3D fine-level shape.

After the cf quad build, the remaining assembly traffic in the 3D step
is the locked t_fn's corner extraction: 96 slices producing
f32[65536,16]{1,0} (16-lane minor -> 8x padded) + reshape(-1) + rolls
(_r4_3d_hlo_auto.txt, grid.py t_fn; trace: slice 4.2 + slice-done 1.6 +
reshape 6.2 + concat 3.0 ms/step). Candidates at one level
(size=2^19, F=2, C=8, K=8, dpacked (size/K, 128) = CSR scatter output):

  A  current: per corner c: dpacked[:, c*16:+16].reshape(-1), roll by
     delta*F, sum -> dflat (size*F,)
  B  channel-first: GIVEN a (C*F, size) cotangent of the cf quad table
     (what a reoriented CSR scatter would emit), per (c, f): 1D roll
     back by +delta, accumulate F planes, interleave once via strided
     .at[f::F].set — never a (rows, <128)-minor array.
  B2 like B but interleave via stack+reshape (the padded control).
  C  interleave-only cost (strided set of F planes).
  D  A-form extraction only (no rolls): the 8 slices+reshapes.

Parity: A vs B on random data (the (C*F, size) input of B is the exact
lane-transpose of A's dpacked).

Run ON TPU:
    python -u benchmarks/probe_r4_tfn_assembly.py \
        > benchmarks/logs/_r4_tfn_assembly.txt 2>&1
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

SIZE = 2**19
F = 2
C = 8
K = 8
REPS = 20
DELTAS = [0, 1, 77, 78, 5929, 5930, 6006, 6007]

r = np.random.default_rng(0)


def timed(name, fn, *args):
    c = jax.jit(fn)
    out = c(*args)
    _ = float(jnp.ravel(jax.tree_util.tree_leaves(out)[0])[0])
    t0 = time.perf_counter()
    for _ in range(REPS):
        out = c(*args)
    _ = float(jnp.ravel(jax.tree_util.tree_leaves(out)[0])[0])
    ms = (time.perf_counter() - t0) / REPS * 1e3
    print(f"{name:52s} {ms:8.3f} ms", flush=True)
    return out, ms


def assemble_a(dpacked):
    dflat = jnp.zeros((SIZE * F,), jnp.float32)
    for c, delta in enumerate(DELTAS):
        blk = dpacked[:, c * K * F : (c + 1) * K * F].reshape(-1)
        dflat = dflat + (jnp.roll(blk, delta * F) if delta else blk)
    return dflat


def assemble_b(dcf):
    # dcf: (C*F, SIZE), row c*F+f = cotangent plane of corner c feat f.
    planes = []
    for f in range(F):
        p = jnp.zeros((SIZE,), jnp.float32)
        for c, delta in enumerate(DELTAS):
            row = dcf[c * F + f]
            p = p + (jnp.roll(row, delta) if delta else row)
        planes.append(p)
    out = jnp.zeros((SIZE * F,), jnp.float32)
    for f in range(F):
        out = out.at[f::F].set(planes[f])
    return out


def assemble_b2(dcf):
    planes = []
    for f in range(F):
        p = jnp.zeros((SIZE,), jnp.float32)
        for c, delta in enumerate(DELTAS):
            row = dcf[c * F + f]
            p = p + (jnp.roll(row, delta) if delta else row)
        planes.append(p)
    return jnp.stack(planes, axis=1).reshape(-1)


def interleave_only(planes0, planes1):
    out = jnp.zeros((SIZE * F,), jnp.float32)
    out = out.at[0::F].set(planes0)
    out = out.at[1::F].set(planes1)
    return out


def extract_only(dpacked):
    return [
        dpacked[:, c * K * F : (c + 1) * K * F].reshape(-1)
        for c in range(C)
    ]


def main():
    print("backend:", jax.default_backend(), flush=True)
    dpacked = jnp.asarray(
        r.normal(size=(SIZE // K, C * K * F)), jnp.float32
    )
    # dcf[c*F+f, row*K + k] == dpacked[row, c*K*F + k*F + f]
    dp = np.asarray(dpacked).reshape(SIZE // K, C, K, F)
    dcf = jnp.asarray(
        np.transpose(dp, (1, 3, 0, 2)).reshape(C * F, SIZE)
    )

    outA, _ = timed("A  current slice+reshape+roll", assemble_a, dpacked)
    outB, _ = timed("B  cf rolls + strided interleave", assemble_b, dcf)
    assert np.array_equal(np.asarray(outA), np.asarray(outB)), "A/B"
    print("A/B parity OK", flush=True)
    timed("B2 cf rolls + stack interleave (control)", assemble_b2, dcf)
    p0 = jnp.asarray(r.normal(size=(SIZE,)), jnp.float32)
    p1 = jnp.asarray(r.normal(size=(SIZE,)), jnp.float32)
    timed("C  interleave only (strided set x2)", interleave_only, p0, p1)
    timed("D  extraction only (8 slices+reshapes)", extract_only, dpacked)


if __name__ == "__main__":
    main()
