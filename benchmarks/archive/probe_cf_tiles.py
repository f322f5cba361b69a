#!/usr/bin/env python
"""Probe: CF-kernel batch-tile sweep. probe_cf showed a ~2.5 ms floor at
B=2^20 independent of width/compute = per-grid-step overhead (256 steps at
tile 4096); bigger tiles should amortize it."""

from __future__ import annotations

import json
import sys
import time
from pathlib import Path

import numpy as np

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))


def main():
    import jax
    import jax.numpy as jnp

    jax.config.update("jax_compilation_cache_dir", str(Path(".jax_cache")))
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

    from tcnn_tpu.common import Activation
    from tcnn_tpu.ops.ffmlp import mlp_backward_pallas, mlp_forward_pallas

    batch = 2**20
    n_hidden = 3
    iters = 30

    def sync(o):
        return float(jnp.asarray(o).ravel()[0])

    for width in (16, 64, 128):
        r = np.random.default_rng(0)
        ws = tuple(
            jnp.asarray(r.normal(0, 0.3, (width, width)), jnp.float32).astype(
                jnp.bfloat16
            )
            for _ in range(n_hidden + 1)
        )
        x = jnp.asarray(r.standard_normal((batch, width)), jnp.bfloat16)
        g = jnp.asarray(r.standard_normal((batch, width)), jnp.bfloat16)
        for tile in (4096, 8192, 16384, 32768):
            for mode in ("inference", "backward"):
                if mode == "backward" and tile * width > 64 * 16384:
                    continue  # pres f32 VMEM blowup
                try:
                    if mode == "inference":
                        fn = jax.jit(
                            lambda x, ws, t=tile: mlp_forward_pallas(
                                x, ws, Activation.ReLU, Activation.NONE,
                                tile_b=t, layout="cf",
                            )
                        )
                        args = (x, ws)
                    else:
                        fn = jax.jit(
                            lambda x, g, ws, t=tile: mlp_backward_pallas(
                                x, g, ws, Activation.ReLU, Activation.NONE,
                                tile_b=t, layout="cf",
                            )[0]
                        )
                        args = (x, g, ws)
                    out = fn(*args)
                    sync(out)
                    t0 = time.perf_counter()
                    for _ in range(iters):
                        out = fn(*args)
                    sync(out)
                    dt = (time.perf_counter() - t0) / iters
                    print(json.dumps({
                        "width": width, "tile": tile, "mode": mode,
                        "ms": round(dt * 1e3, 3),
                        "elements_per_second": round(batch / dt, 1),
                    }))
                except Exception as e:
                    print(json.dumps({"width": width, "tile": tile,
                                      "mode": mode,
                                      "error": str(e)[:160]}))


if __name__ == "__main__":
    main()
