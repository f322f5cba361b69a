#!/usr/bin/env python
"""Amortized streaming serving throughput (VERDICT r1 #4).

Single-dispatch inference pays the full tunnel/dispatch latency per call
(9.6 ms @ 2^18 -> 2.7e7 samples/s). Production serving streams batches:
JAX's async dispatch queues steps back-to-back and the host only syncs at
the end, so the per-dispatch overhead amortizes to the device-side step
time. Measures:
  1. sync-per-call (the honest single-request latency),
  2. N-deep pipeline with device-resident inputs (device-side ceiling),
  3. N-deep pipeline with per-call host->device transfer (realistic
     ingest; over the tunnel this is transfer-bound, on a real host DMA
     overlaps compute).

Run ON TPU: python -u benchmarks/probe_serving_stream.py > _probe_stream.txt 2>&1
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

B = 2**18
N = 32


def main():
    print("backend:", jax.default_backend(), flush=True)
    model = tc.create_from_config(2, 3, ge.FLAGSHIP_CONFIG)
    tr = model.trainer
    r = np.random.default_rng(0)

    # Device-resident input set (ring of 4 distinct batches so nothing
    # constant-folds or caches).
    xs = [
        jax.device_put(
            jnp.asarray(r.uniform(0, 1, (B, 2)).astype(np.float32))
        )
        for _ in range(4)
    ]
    # Use the public path; it is jitted internally.
    y = tr.inference(xs[0])
    _ = float(y.ravel()[0])  # warm + sync

    # 1. sync per call
    t0 = time.perf_counter()
    for i in range(8):
        y = tr.inference(xs[i % 4])
        _ = float(y.ravel()[0])
    sync_ms = (time.perf_counter() - t0) / 8 * 1e3
    print(f"sync-per-call: {sync_ms:.2f} ms  "
          f"({B / sync_ms * 1e3 / 1e6:.1f} M samples/s)", flush=True)

    # 2. pipelined, device-resident
    t0 = time.perf_counter()
    outs = [tr.inference(xs[i % 4]) for i in range(N)]
    _ = float(outs[-1].ravel()[0])
    pipe_ms = (time.perf_counter() - t0) / N * 1e3
    print(f"pipelined x{N} (device-resident): {pipe_ms:.2f} ms  "
          f"({B / pipe_ms * 1e3 / 1e6:.1f} M samples/s)", flush=True)

    # 3. pipelined with per-call host ingest
    host = [np.random.default_rng(i).uniform(0, 1, (B, 2)).astype(np.float32)
            for i in range(4)]
    t0 = time.perf_counter()
    outs = [tr.inference(jnp.asarray(host[i % 4])) for i in range(N)]
    _ = float(outs[-1].ravel()[0])
    ingest_ms = (time.perf_counter() - t0) / N * 1e3
    print(f"pipelined x{N} (host ingest): {ingest_ms:.2f} ms  "
          f"({B / ingest_ms * 1e3 / 1e6:.1f} M samples/s)", flush=True)


if __name__ == "__main__":
    main()
