#!/usr/bin/env python
"""Round-5 probe: width-128 FFMLP inference tile sweep (VERDICT r4 item 5:
>= 60%% of the ~1.5G rows/s I/O roofline, i.e. ~900M rows/s).

w128 inference is I/O-bound: in+out = 512 B/row compact (no padding at
128 lanes) -> 819 GB/s HBM gives ~1.6G rows/s absolute. Current kernel:
545-635M at tile 4096. Sweep tiles {4096, 8192, 16384, 32768} x layouts
{rm, cf} (round-3 note: >=16384 hit Mosaic remote-compile 500s — retry
on the current toolchain).

Usage: python benchmarks/probe_r5_w128_tiles.py [--batch 2**20]
"""

import argparse
import statistics
import sys
import time
from pathlib import Path

import numpy as np

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--log-batch", type=int, default=20)
    ap.add_argument("--iters", type=int, default=30)
    args = ap.parse_args()

    import jax

    jax.config.update(
        "jax_compilation_cache_dir",
        str(Path(__file__).resolve().parent.parent / ".jax_cache"),
    )
    import jax.numpy as jnp

    from tcnn_tpu.common import Activation
    from tcnn_tpu.ops.ffmlp import mlp_forward_pallas
    from tcnn_tpu.networks import FullyFusedMLP
    from tcnn_tpu.rng import make_rng

    B = 1 << args.log_batch
    net = FullyFusedMLP(input_width=128, output_width=128, n_neurons=128,
                        n_hidden_layers=3)
    params = jnp.asarray(net.initialize_params(make_rng(1337)))
    weights_t = tuple(
        w.astype(jnp.bfloat16).T for w in net._weights(params)
    )
    x = jnp.asarray(
        np.random.default_rng(0).standard_normal((B, 128)), jnp.bfloat16
    )

    for layout in ("cf", "rm"):
        for tile in (4096, 8192, 16384, 32768):
            @jax.jit
            def fn(xx, wts, tile=tile, layout=layout):
                return mlp_forward_pallas(
                    xx, wts, Activation.ReLU, Activation.NONE,
                    tile_b=tile, layout=layout,
                )

            tag = f"w128 {layout} tile={tile}"
            try:
                out = fn(x, weights_t)
                _ = float(out.ravel()[0].astype(jnp.float32))
            except Exception as e:
                msg = str(e).replace("\n", " ")[:200]
                print(f"{tag}: FAILED {type(e).__name__}: {msg}",
                      flush=True)
                continue
            ms = []
            for _ in range(3):
                t0 = time.perf_counter()
                for _ in range(args.iters):
                    out = fn(x, weights_t)
                _ = float(out.ravel()[0].astype(jnp.float32))
                ms.append((time.perf_counter() - t0) / args.iters * 1e3)
            med = statistics.median(ms)
            print(
                f"{tag}: {med:.3f} ms = {B / med / 1e3:.0f}M rows/s "
                f"(blocks {[round(m, 3) for m in ms]})",
                flush=True,
            )
    print("done", flush=True)


if __name__ == "__main__":
    main()
