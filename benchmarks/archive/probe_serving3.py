#!/usr/bin/env python
"""Round-3 serving measurements (VERDICT r2 next-4).

The Mosaic VMEM-resident fused gather+MLP kernel remains inexpressible on
jax 0.9.0 (re-verified round 2: no multi-vreg dynamic gather,
probe_mosaic_gather*.py — unchanged jax/jaxlib since, so the negative
stands). What production serving CAN do on the XLA path:

  1. pipeline dispatches (async queue amortizes the per-call tunnel +
     dispatch latency to the device-side step time),
  2. serve bigger batches (per-dispatch fixed costs amortize),
  3. raster serving where the request layout allows it (separable
     static-lerp coarse levels).

This probe records all three at B = 2^18 and 2^20 for the flagship
config, plus raster serving at 512^2 and 1024^2 — the committed basis
for the serving ceiling analysis in PLAN.md.

Run ON TPU: python -u benchmarks/probe_serving3.py > _serving3.txt 2>&1
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

import __graft_entry__ as ge  # noqa: E402
import tcnn_tpu as tc  # noqa: E402

N = 32


def main():
    print("backend:", jax.default_backend(), flush=True)
    model = tc.create_from_config(2, 3, ge.FLAGSHIP_CONFIG)
    tr = model.trainer
    r = np.random.default_rng(0)

    for B in (2**18, 2**20):
        xs = [
            jax.device_put(
                jnp.asarray(r.uniform(0, 1, (B, 2)).astype(np.float32))
            )
            for _ in range(4)
        ]
        y = tr.inference(xs[0])
        _ = float(y.ravel()[0])

        t0 = time.perf_counter()
        for i in range(8):
            y = tr.inference(xs[i % 4])
            _ = float(y.ravel()[0])
        sync_ms = (time.perf_counter() - t0) / 8 * 1e3
        print(
            f"B=2^{B.bit_length()-1} sync-per-call: {sync_ms:.2f} ms "
            f"({B / sync_ms * 1e3 / 1e6:.1f} M samples/s)",
            flush=True,
        )

        t0 = time.perf_counter()
        outs = [tr.inference(xs[i % 4]) for i in range(N)]
        _ = float(outs[-1].ravel()[0])
        pipe_ms = (time.perf_counter() - t0) / N * 1e3
        print(
            f"B=2^{B.bit_length()-1} pipelined x{N}: {pipe_ms:.2f} ms "
            f"({B / pipe_ms * 1e3 / 1e6:.1f} M samples/s)",
            flush=True,
        )

    for side in (512, 1024):
        y = tr.inference_raster((side, side))
        _ = float(y.ravel()[0])
        t0 = time.perf_counter()
        outs = [tr.inference_raster((side, side)) for _ in range(8)]
        _ = float(outs[-1].ravel()[0])
        ms = (time.perf_counter() - t0) / 8 * 1e3
        n = side * side
        print(
            f"raster {side}^2 pipelined x8: {ms:.2f} ms "
            f"({n / ms * 1e3 / 1e6:.1f} M samples/s)",
            flush=True,
        )
    print("PROBE_DONE", flush=True)


if __name__ == "__main__":
    main()
