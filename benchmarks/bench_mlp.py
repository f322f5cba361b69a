#!/usr/bin/env python
"""MLP inference/training throughput benchmark.

Port of the reference protocol (benchmarks/mlp/bench_mlp_ours.cu:64-137):
batch 2^20, widths {32, 64, 128}, 3 hidden layers, ReLU; metric is
elements/second for each method {fully_fused (Pallas), xla (jnp chain)}.
Writes bench_result_ours.json in the same spirit.
"""

from __future__ import annotations

import argparse
import json
import sys
import time
from pathlib import Path

import numpy as np

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))


def bench_one(width: int, batch: int, iters: int, method: str, train: bool):
    import jax
    import jax.numpy as jnp

    from tcnn_tpu.networks import FullyFusedMLP, MLP
    from tcnn_tpu.rng import make_rng

    cls = MLP if method == "xla" else FullyFusedMLP
    kwargs = {}
    if method == "fully_fused_cf":
        kwargs = {"layout": "cf", "use_pallas": True}
    elif method == "fully_fused":
        kwargs = {"layout": "rm", "use_pallas": True}
    net = cls(
        input_width=width,
        output_width=width,
        n_neurons=width,
        n_hidden_layers=3,
        **kwargs,
    )
    params = jnp.asarray(net.initialize_params(make_rng(1337)))
    x = jnp.asarray(
        np.random.default_rng(0).standard_normal((batch, width)), jnp.bfloat16
    )

    if method == "fully_fused_packed":
        # Packed-I/O layout (G = 128/width samples per 128-lane row — a
        # layout-free reshape of compact host data; see ops/ffmlp.
        # mlp_forward_pallas_packed). Width 128 has no packing (G=1)
        # and is skipped by the caller.
        G = 128 // width
        xp = jnp.asarray(
            np.random.default_rng(0)
            .standard_normal((batch, width))
            .reshape(batch // G, G * width),
            jnp.bfloat16,
        )
        if train:
            @jax.jit
            def fn(p, x):
                return jax.grad(
                    lambda pp: net.apply_packed(pp, x)
                    .astype(jnp.float32).sum()
                )(p)
        else:
            fn = jax.jit(net.apply_packed)
        return _timed_blocks(fn, params, xp, batch=batch, iters=iters)

    if train:
        @jax.jit
        def fn(p, x):
            return jax.grad(
                lambda pp: net.apply(pp, x).astype(jnp.float32).sum()
            )(p)
    else:
        fn = jax.jit(net.apply)

    return _timed_blocks(fn, params, x, batch=batch, iters=iters)


def _timed_blocks(fn, *args, batch: int, iters: int, n_blocks: int = 3):
    """Median-of-blocks throughput + the per-block values (the narrow
    kernels' standalone timings disperse up to +-40% across sessions;
    a single block reads as signal when it is noise). Scalar-fetch
    sync: block_until_ready is unreliable over the axon tunnel."""
    import time as _time

    import jax
    import jax.numpy as jnp

    def sync(o):
        leaves = jax.tree_util.tree_leaves(o)
        return float(jnp.asarray(leaves[0]).ravel()[0])

    out = fn(*args)
    sync(out)
    blocks = []
    for _ in range(n_blocks):
        t0 = _time.perf_counter()
        for _ in range(iters):
            out = fn(*args)
        sync(out)
        blocks.append(batch * iters / (_time.perf_counter() - t0))
    blocks.sort()
    return blocks[len(blocks) // 2], blocks


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--batch", type=int, default=2**20)
    ap.add_argument("--iters", type=int, default=30)
    ap.add_argument("--widths", type=int, nargs="+",
                    default=[16, 32, 64, 128])
    ap.add_argument("--out", default="bench_result_ours.json")
    args = ap.parse_args()

    results = []
    for width in args.widths:
        methods = ["fully_fused", "fully_fused_cf", "xla"]
        if width < 128:
            methods.append("fully_fused_packed")
        for method in methods:
            for train in (False, True):
                tput, blocks = bench_one(
                    width, args.batch, args.iters, method, train
                )
                entry = {
                    "width": width,
                    "method": method,
                    "mode": "training" if train else "inference",
                    "batch": args.batch,
                    "elements_per_second": round(tput, 1),
                    "blocks": [round(b, 1) for b in blocks],
                }
                print(json.dumps(entry))
                results.append(entry)

    Path(args.out).write_text(json.dumps(results, indent=2))
    print(f"# wrote {args.out}", file=sys.stderr)


if __name__ == "__main__":
    main()
