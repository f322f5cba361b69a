#!/usr/bin/env python
"""Composed-profile attribution of the 2D flagship LOCKED+EMA step.

The bench default moved to phase-locked G=1 + EMA(0.99) at 23.75 ms
(queue 7); the last 2D profile (probe_2d_profile, round 2) predates the
locked mode. This profiles the exact bench-default step — including the
on-device stratified sampler and identity-target lookup — and prints
per-op attribution, to find what separates 23.75 ms from the ~14 ms of
measured floors (5 fine-level CSR transposes + gathers + MLP + Adam).

Run ON TPU: python -u benchmarks/probe_2d_profile2.py > _probe2dp2.txt 2>&1
"""

import glob
import gzip
import json
import sys
import time
from collections import defaultdict
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

import tcnn_tpu as tc  # noqa: E402
from tcnn_tpu.utils.sampling import stratified_uniform  # noqa: E402

TRACE_DIR = "/tmp/tcnn_trace_2dp2"


def main():
    print("backend:", jax.default_backend(), flush=True)
    batch = 2**18
    res = 512

    model = tc.create_from_config(2, 3, {
        "loss": {"otype": "RelativeL2"},
        "optimizer": {
            "otype": "EMA", "decay": 0.99,
            "nested": {"otype": "Adam", "learning_rate": 1e-2,
                       "beta1": 0.9, "beta2": 0.99, "epsilon": 1e-15,
                       "l2_reg": 1e-6},
        },
        "encoding": {
            "otype": "HashGrid", "n_levels": 16, "n_features_per_level": 2,
            "log2_hashmap_size": 15, "base_resolution": 16,
            "per_level_scale": 1.5, "hash": "CoherentAdditive",
            "gather_strategy": "stratified",
            "phase_locked": True, "locked_phases": 1,
        },
        "network": {"otype": "FullyFusedMLP", "activation": "ReLU",
                    "output_activation": "None", "n_neurons": 64,
                    "n_hidden_layers": 2},
    })
    trainer = model.trainer
    enc = model.model.encoding
    print("locked levels:", sorted(enc._locked_levels(512)), flush=True)

    yy, xx = np.meshgrid(np.linspace(0, 1, res), np.linspace(0, 1, res),
                         indexing="ij")
    image = np.stack(
        [
            0.5 + 0.5 * np.sin(8 * np.pi * xx) * np.cos(6 * np.pi * yy),
            0.5 + 0.5 * np.cos(4 * np.pi * (xx + yy)),
            0.5 + 0.5 * np.sin(2 * np.pi * xx * yy * 4),
        ],
        axis=-1,
    ).astype(np.float32)
    image_dev = jnp.asarray(image)

    def bench_step(state, key, img):
        xy = stratified_uniform(key, batch, 2, phase_locked=1)
        target = img.reshape(res * res, 3)
        return trainer._step_impl(state, xy, target, None)

    t0 = time.time()
    c = jax.jit(bench_step).lower(
        trainer.state, jax.random.PRNGKey(0), image_dev
    ).compile()
    print(f"compile {time.time()-t0:.0f}s", flush=True)
    state = trainer.state
    key = jax.random.PRNGKey(0)
    state, loss = c(state, key, image_dev)
    _ = float(loss)
    t0 = time.perf_counter()
    for _ in range(20):
        state, loss = c(state, key, image_dev)
    _ = float(loss)
    print(f"full step: {(time.perf_counter()-t0)/20*1e3:.2f} ms", flush=True)

    jax.profiler.start_trace(TRACE_DIR)
    for _ in range(3):
        state, loss = c(state, key, image_dev)
    _ = float(loss)
    jax.profiler.stop_trace()

    files = glob.glob(TRACE_DIR + "/**/*.trace.json.gz", recursive=True)
    if not files:
        print("no trace files", flush=True)
        return
    with gzip.open(sorted(files)[-1], "rt") as f:
        trace = json.load(f)
    events = trace.get("traceEvents", [])
    name_by_pid = {}
    for e in events:
        if e.get("ph") == "M" and e.get("name") == "process_name":
            name_by_pid[e["pid"]] = e["args"].get("name", "")
    totals = defaultdict(float)
    counts = defaultdict(int)
    grand = 0.0
    for e in events:
        if e.get("ph") != "X":
            continue
        pname = name_by_pid.get(e.get("pid"), "")
        if "TPU" not in pname and "device" not in pname.lower():
            continue
        nm = e.get("name", "")
        if nm.startswith("jit_"):
            continue
        totals[nm] += e.get("dur", 0.0)
        counts[nm] += 1
        grand += e.get("dur", 0.0)
    print(f"grand total {grand/3:.0f} us/step over 3 steps")
    print(f"{'us/step':>9} {'n':>5}  op")
    for nm, us in sorted(totals.items(), key=lambda kv: -kv[1])[:60]:
        print(f"{us/3:9.0f} {counts[nm]:5d}  {nm[:110]}")
    # HLO dump for op-name -> source attribution.
    Path("/tmp/hlo_2d_locked.txt").write_text(c.as_text())
    print("HLO written to /tmp/hlo_2d_locked.txt", flush=True)


if __name__ == "__main__":
    main()
