#!/usr/bin/env python
"""Per-op attribution of the REFERENCE-VERBATIM config step under the
new auto(=quad) default (round-5): where do the ~114 ms go, and what —
if anything — is still attackable within reference-exact semantics
(CoherentPrime hash, iid batches)?

Run ON TPU:
    python -u benchmarks/probe_r5_verbatim_profile.py \
        > benchmarks/logs/_r5_verbatim_profile.txt 2>&1
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

import tcnn_tpu as tc  # noqa: E402

TRACE_DIR = "/tmp/tcnn_trace_r5verb"


def main():
    print("backend:", jax.default_backend(), flush=True)
    batch = 2**18
    x = jax.random.uniform(jax.random.PRNGKey(0), (batch, 2), jnp.float32)
    tgt = jax.random.uniform(jax.random.PRNGKey(1), (batch, 3))
    model = tc.create_from_config(2, 3, {
        "loss": {"otype": "RelativeL2"},
        "optimizer": {"otype": "Adam", "learning_rate": 1e-2,
                      "beta1": 0.9, "beta2": 0.99, "epsilon": 1e-15,
                      "l2_reg": 1e-6},
        "encoding": {
            "otype": "HashGrid", "n_levels": 16,
            "n_features_per_level": 2, "log2_hashmap_size": 15,
            "base_resolution": 16, "per_level_scale": 1.5,
        },
        "network": {"otype": "FullyFusedMLP", "n_neurons": 64,
                    "n_hidden_layers": 2},
    }, seed=1)
    trainer = model.trainer
    print("gather:", model.model.encoding.gather_strategy, flush=True)

    def step(state, xx, tt):
        return trainer._step_impl(state, xx, tt, None)

    c = jax.jit(step)
    state = trainer.state
    out = c(state, x, tgt)
    _ = float(jax.tree_util.tree_leaves(out)[0].ravel()[0])
    t0 = time.perf_counter()
    for _ in range(10):
        out = c(state, x, tgt)
    _ = float(jax.tree_util.tree_leaves(out)[0].ravel()[0])
    print(f"full step: {(time.perf_counter()-t0)/10*1e3:.2f} ms", flush=True)

    jax.profiler.start_trace(TRACE_DIR)
    for _ in range(3):
        out = c(state, x, tgt)
    _ = float(jax.tree_util.tree_leaves(out)[0].ravel()[0])
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
    print(f"\ndevice tracks: {sorted(set(name_by_pid.values()))}")
    print(f"grand total {grand/3:.0f} us/step over 3 steps")
    print(f"{'us/step':>9} {'n':>5}  op")
    for nm, us in sorted(totals.items(), key=lambda kv: -kv[1])[:60]:
        print(f"{us/3:9.0f} {counts[nm]:5d}  {nm[:110]}")

    hlo = c.lower(state, x, tgt).compile().as_text()
    out_path = Path(__file__).parent / "logs" / "_r5_verbatim_hlo.txt"
    out_path.write_text(hlo)
    print(f"full HLO -> {out_path} ({len(hlo)} bytes)", flush=True)


if __name__ == "__main__":
    main()
