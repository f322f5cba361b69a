#!/usr/bin/env python
"""Kernel-internal lane packing (kpack) probe — VERDICT r1 #2.

Measures the fused Pallas MLP fwd / fwd+bwd at widths {16, 32, 64} with
and without in-kernel slab packing, vs the XLA chain, at batch 2^18 and
2^20 (the bench_mlp protocol widths where the kernel loses to XLA today).

Run ON TPU: python -u benchmarks/probe_kpack.py > _probe_kpack.txt 2>&1
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

from tcnn_tpu.common import Activation  # noqa: E402
from tcnn_tpu.ops.ffmlp import (  # noqa: E402
    mlp_backward_pallas,
    mlp_forward_pallas,
)


def timeit(fn, *args, reps=30):
    out = fn(*args)
    _ = float(jax.tree_util.tree_leaves(out)[0].ravel()[0])
    t0 = time.perf_counter()
    for _ in range(reps):
        out = fn(*args)
    _ = float(jax.tree_util.tree_leaves(out)[0].ravel()[0])
    return (time.perf_counter() - t0) / reps * 1e3


def main():
    print("backend:", jax.default_backend(), flush=True)
    r = np.random.default_rng(0)
    n_hidden = 4  # bench_mlp protocol: 4 hidden layers
    for batch in (2**18, 2**20):
        for width in (16, 32, 64):
            in_w = out_w = width
            shapes = [(in_w, width)] + [(width, width)] * (n_hidden - 1) + [
                (width, out_w)
            ]
            wts = tuple(
                jnp.asarray(r.normal(0, 0.2, s).astype(np.float32),
                            jnp.bfloat16)
                for s in shapes
            )
            x = jnp.asarray(
                r.normal(0, 1, (batch, in_w)).astype(np.float32), jnp.bfloat16
            )
            g = jnp.asarray(
                r.normal(0, 1, (batch, out_w)).astype(np.float32),
                jnp.bfloat16,
            )
            flops_f = 2 * batch * sum(a * b for a, b in shapes)

            for kp in (False, True):
                try:
                    fwd = jax.jit(
                        lambda x, w, kp=kp: mlp_forward_pallas(
                            x, w, Activation.ReLU, Activation.NONE, kpack=kp
                        )
                    )
                    ms = timeit(fwd, x, wts)
                    # fwd+bwd via the pallas backward
                    bwd = jax.jit(
                        lambda x, g, w, kp=kp: mlp_backward_pallas(
                            x, g, w, Activation.ReLU, Activation.NONE,
                            kpack=kp,
                        )
                    )
                    ms_b = timeit(bwd, x, g, wts)
                    print(
                        f"B=2^{batch.bit_length()-1} w={width:3d} "
                        f"kpack={int(kp)}: fwd {ms:7.3f} ms "
                        f"({flops_f/ms/1e9:6.1f} TF/s) "
                        f"bwd {ms_b:7.3f} ms "
                        f"({3*flops_f/ms_b/1e9:6.1f} TF/s)",
                        flush=True,
                    )
                except Exception as e:
                    print(
                        f"B=2^{batch.bit_length()-1} w={width:3d} "
                        f"kpack={int(kp)}: FAILED {type(e).__name__}: "
                        f"{str(e)[:200]}",
                        flush=True,
                    )


if __name__ == "__main__":
    main()
