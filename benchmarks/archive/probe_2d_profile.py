#!/usr/bin/env python
"""Profile the flagship composed train step (current defaults) and print
top device ops — chrome-trace parsing, no tensorboard. Run ON TPU:
    python -u benchmarks/probe_2d_profile.py > _probe2d_profile.txt 2>&1
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

TRACE_DIR = "/tmp/tcnn_trace_2d"


def main():
    print("backend:", jax.default_backend(), flush=True)
    batch = 2**18
    model = tc.create_from_config(2, 3, {
        "loss": {"otype": "RelativeL2"},
        "optimizer": {"otype": "Adam", "learning_rate": 1e-2, "beta1": 0.9,
                      "beta2": 0.99, "epsilon": 1e-15, "l2_reg": 1e-6},
        "encoding": {"otype": "HashGrid", "n_levels": 16,
                     "n_features_per_level": 2, "log2_hashmap_size": 15,
                     "base_resolution": 16, "per_level_scale": 1.5,
                     "hash": "CoherentAdditive",
                     "gather_strategy": "stratified"},
        "network": {"otype": "FullyFusedMLP", "n_neurons": 64,
                    "n_hidden_layers": 2},
    })
    trainer = model.trainer
    key = jax.random.PRNGKey(0)
    x = stratified_uniform(key, batch, 2)
    t = jnp.concatenate([x, (x[:, :1] + x[:, 1:]) / 2], axis=1)

    loss = float(trainer.training_step(x, t))
    t0 = time.perf_counter()
    for _ in range(10):
        loss_arr = trainer.training_step(x, t)
    loss = float(loss_arr)
    print(f"train step: {(time.perf_counter()-t0)/10*1e3:.2f} ms "
          f"(loss {loss:.4f})", flush=True)

    jax.profiler.start_trace(TRACE_DIR)
    for _ in range(3):
        loss_arr = trainer.training_step(x, t)
    _ = float(loss_arr)
    jax.profiler.stop_trace()

    files = glob.glob(TRACE_DIR + "/**/*.trace.json.gz", recursive=True)
    print("trace files:", files, flush=True)
    if not files:
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
    print(f"\ndevice tracks: {sorted(set(name_by_pid.values()))}")
    print(f"{'total_us':>10} {'n':>5}  op")
    for nm, us in sorted(totals.items(), key=lambda kv: -kv[1])[:50]:
        print(f"{us:10.0f} {counts[nm]:5d}  {nm[:110]}")


if __name__ == "__main__":
    main()
