#!/usr/bin/env python
"""Serving fine-gather structure probe: loop-fused vs materialized.

PLAN round 2 measured the raster-serving fine-level row gathers at
~4 ns/row loop-fused — 2x what the materialized gather emitter's floor
would predict (the training-context fine fwd gathers run 1.8 ns/row).
If forcing materialization (optimization_barrier after each fine-level
gather) recovers the 2x, the 1024^2 raster drops ~10 ms and serving
clears 5e7 samples/s. This probe monkeypatches grid.gather_rows with a
barrier-wrapped version and A/Bs FrozenServer raster throughput.

Run ON TPU: python -u benchmarks/probe_serving5.py > _serving5.txt 2>&1
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
from tcnn_tpu.encodings import grid as grid_mod  # noqa: E402

_orig_gather_rows = grid_mod.gather_rows


def _barrier_gather_rows(table, idx, scatter="xla", forward_dtype=None):
    out = _orig_gather_rows(table, idx, scatter, forward_dtype)
    return jax.lax.optimization_barrier(out)


def measure(tag):
    model = tc.create_from_config(2, 3, ge.FLAGSHIP_CONFIG)
    server = model.trainer.freeze_serving()
    for side, reps in ((512, 8), (1024, 8)):
        y = server.raster((side, side))
        _ = float(y.ravel()[0])
        t0 = time.perf_counter()
        outs = [server.raster((side, side)) for _ in range(reps)]
        _ = float(outs[-1].ravel()[0])
        ms = (time.perf_counter() - t0) / reps * 1e3
        print(
            f"[{tag}] raster {side}^2: {ms:.2f} ms "
            f"({side*side/ms*1e3/1e6:.1f} M samples/s)",
            flush=True,
        )


def main():
    print("backend:", jax.default_backend(), flush=True)
    measure("fused   ")
    grid_mod.gather_rows = _barrier_gather_rows
    try:
        measure("barrier ")
    finally:
        grid_mod.gather_rows = _orig_gather_rows
    print("PROBE_DONE", flush=True)


if __name__ == "__main__":
    main()
