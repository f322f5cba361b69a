#!/usr/bin/env python
"""FrozenServer throughput (VERDICT r2 next-4): prebuilt-table serving.

probe_serving3 measured live-trainer serving: B=2^18 pipelined 15.5 ms
(16.9 M/s), raster 512^2 10.2 ms (25.7 M/s), raster 1024^2 24.0 ms
(43.8 M/s). FrozenServer hoists the per-call quad builds out of the
jitted program (serving_tables); this probe measures the same protocol
through the server, plus 2048^2 (amortization) — the committed basis
for the serving number in bench.py --serving and the PLAN.md ceiling
analysis.

Run ON TPU: python -u benchmarks/probe_serving4.py > _serving4.txt 2>&1
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
    server = tr.freeze_serving()
    print("served levels:", sorted(server._tables or {}), flush=True)
    r = np.random.default_rng(0)

    for B in (2**18, 2**20):
        xs = [
            jax.device_put(
                jnp.asarray(r.uniform(0, 1, (B, 2)).astype(np.float32))
            )
            for _ in range(4)
        ]
        y = server(xs[0])
        _ = float(y.ravel()[0])
        t0 = time.perf_counter()
        outs = [server(xs[i % 4]) for i in range(N)]
        _ = float(outs[-1].ravel()[0])
        pipe_ms = (time.perf_counter() - t0) / N * 1e3
        print(
            f"server B=2^{B.bit_length()-1} pipelined x{N}: {pipe_ms:.2f} ms "
            f"({B / pipe_ms * 1e3 / 1e6:.1f} M samples/s)",
            flush=True,
        )

    for side in (512, 1024, 2048):
        y = server.raster((side, side))
        _ = float(y.ravel()[0])
        reps = 8 if side < 2048 else 4
        t0 = time.perf_counter()
        outs = [server.raster((side, side)) for _ in range(reps)]
        _ = float(outs[-1].ravel()[0])
        ms = (time.perf_counter() - t0) / reps * 1e3
        n = side * side
        print(
            f"server raster {side}^2 pipelined x{reps}: {ms:.2f} ms "
            f"({n / ms * 1e3 / 1e6:.1f} M samples/s)",
            flush=True,
        )
    print("PROBE_DONE", flush=True)


if __name__ == "__main__":
    main()
