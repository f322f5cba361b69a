#!/usr/bin/env python
"""Composed A/B of the fused Pallas Adam step (VERDICT r2 next-2).

The kernel is parity-tested and auto-enabled on TPU, but its COMPOSED
effect was never isolated: bench measured 26.44 ms (round 2, XLA Adam)
vs 26.7 ms (round 3, fused) — within noise. The round-2 profile
attributed ~1.5 ms to "Adam/loss-scale whiles"; if the fused kernel is
not recovering it, either the XLA chain was already overlapped with
other work, or the whiles belong to something else (loss-scale logic).
This probe measures the flagship train step with optimizer.fused forced
True/False, same session, interleaved order.

Run ON TPU: python -u benchmarks/probe_adam_ab.py > _adam_ab.txt 2>&1
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
from tcnn_tpu.utils.sampling import stratified_uniform  # noqa: E402

B = 2**18


def measure(fused):
    model = tc.create_from_config(2, 3, ge.FLAGSHIP_CONFIG, seed=1)
    trainer = model.trainer
    trainer.optimizer.fused = fused
    trainer.update_hyperparams({})  # re-jit with the knob baked in
    x = stratified_uniform(jax.random.PRNGKey(0), B, 2)
    t = jax.random.uniform(jax.random.PRNGKey(1), (B, 3))

    def step(state, xx, tt):
        return trainer._step_impl(state, xx, tt, None)

    c = jax.jit(step).lower(trainer.state, x, t).compile()
    state, loss = c(trainer.state, x, t)
    _ = float(loss)
    t0 = time.perf_counter()
    for _i in range(30):
        state, loss = c(state, x, t)
    _ = float(loss)
    ms = (time.perf_counter() - t0) / 30 * 1e3
    print(f"fused={fused}: {ms:.2f} ms/step", flush=True)
    return ms


def main():
    print("backend:", jax.default_backend(), flush=True)
    for rep in range(2):  # interleave to control drift
        measure(True)
        measure(False)
    print("PROBE_DONE", flush=True)


if __name__ == "__main__":
    main()
