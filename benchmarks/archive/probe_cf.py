#!/usr/bin/env python
"""Probe: channel-first (weights-stationary) FFMLP kernel vs row-major vs XLA.

The CF layout keeps activations (width, tile_b) so the batch fills the
128-lane axis; per-MXU-pass element rate should be 128/width higher than
the row-major kernel at narrow widths (VERDICT-r1 item 2's second lever).
Reports elements/s and the achieved fraction of the v5e bf16 roofline.
"""

from __future__ import annotations

import json
import sys
import time
from pathlib import Path

import numpy as np

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

V5E_BF16_FLOPS = 197e12


def main():
    import jax
    import jax.numpy as jnp

    jax.config.update("jax_compilation_cache_dir", str(Path(".jax_cache")))
    jax.config.update("jax_persistent_cache_min_entry_size_bytes", -1)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 0)

    from tcnn_tpu.common import Activation
    from tcnn_tpu.ops.ffmlp import mlp_backward_pallas, mlp_forward_pallas

    batch = 2**20
    n_hidden = 3
    iters = 30
    results = []

    def sync(o):
        return float(jnp.asarray(o).ravel()[0])

    for width in (16, 32, 64, 128):
        r = np.random.default_rng(0)
        # bench_mlp protocol: in = out = width, 3 hidden layers -> 4 mats.
        ws = tuple(
            jnp.asarray(r.normal(0, 0.3, (width, width)), jnp.float32).astype(
                jnp.bfloat16
            )
            for _ in range(n_hidden + 1)
        )
        x = jnp.asarray(r.standard_normal((batch, width)), jnp.bfloat16)
        g = jnp.asarray(r.standard_normal((batch, width)), jnp.bfloat16)

        for layout in ("rm", "cf"):
            fwd = jax.jit(
                lambda x, ws, lay=layout: mlp_forward_pallas(
                    x, ws, Activation.ReLU, Activation.NONE, layout=lay
                )
            )
            bwd = jax.jit(
                lambda x, g, ws, lay=layout: mlp_backward_pallas(
                    x, g, ws, Activation.ReLU, Activation.NONE, layout=lay
                )[0]
            )
            for mode, fn, args in (
                ("inference", fwd, (x, ws)),
                ("backward", bwd, (x, g, ws)),
            ):
                try:
                    out = fn(*args)
                    sync(out)
                    t0 = time.perf_counter()
                    for _ in range(iters):
                        out = fn(*args)
                    sync(out)
                    dt = (time.perf_counter() - t0) / iters
                except Exception as e:  # Mosaic compile failures
                    print(json.dumps({"width": width, "layout": layout,
                                      "mode": mode, "error": str(e)[:200]}))
                    continue
                flops_per_row = 2 * (n_hidden + 1) * width * width
                if mode == "backward":
                    flops_per_row *= 3  # recompute + dgrad + wgrad
                tf = flops_per_row * batch / dt / 1e12
                entry = {
                    "width": width,
                    "layout": layout,
                    "mode": mode,
                    "ms": round(dt * 1e3, 3),
                    "elements_per_second": round(batch / dt, 1),
                    "tflops": round(tf, 2),
                    "mxu_frac": round(tf * 1e12 / V5E_BF16_FLOPS, 4),
                }
                print(json.dumps(entry))
                results.append(entry)

    Path("benchmarks/probe_cf_result.json").write_text(
        json.dumps(results, indent=2)
    )


if __name__ == "__main__":
    main()
