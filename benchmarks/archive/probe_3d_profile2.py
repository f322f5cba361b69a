#!/usr/bin/env python
"""Composed-profile attribution of the 3D NeRF-scale LOCKED train step.

probe_3d_locked2/probe_3d_final put the locked static-CSR config at
~105 ms/step (quad-hybrid baseline 122).  This probe profiles the FULL
composed train step (fwd + loss + bwd + Adam) under the locked config
and attributes every device op, the way the round-2 2D attribution did
(probe_2d_profile / probe_2d_hlo_names) — so each remaining block is
either attacked or pinned to a measured floor.

Suspected blocks (PLAN.md round 3 session 2b):
  - 11 locked levels x ~2.5 ms unpacked forward gather
  - 11 locked levels x ~3.35 ms (pair) / ~2.4 ms (single) CSR transpose
  - 5 unlocked coarse levels (variants=1 disables static in 3D) riding
    the quad/emitter path: gather + packed emitter scatter each

Run ON TPU: python -u benchmarks/probe_3d_profile2.py > _probe3dp2.txt 2>&1
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

TRACE_DIR = "/tmp/tcnn_trace_3dp2"
ROUNDING = sys.argv[1] if len(sys.argv) > 1 else "pair"


def main():
    print("backend:", jax.default_backend(), "rounding:", ROUNDING,
          flush=True)
    batch = 2**18
    x = stratified_uniform(jax.random.PRNGKey(0), batch, 3,
                           phase_locked=True)
    tgt = jax.random.uniform(jax.random.PRNGKey(1), (batch, 3))

    model = tc.create_from_config(3, 3, {
        "loss": {"otype": "RelativeL2"},
        "optimizer": {"otype": "Adam", "learning_rate": 1e-2,
                      "beta2": 0.99, "epsilon": 1e-15, "l2_reg": 1e-6},
        "encoding": {
            "otype": "HashGrid", "n_levels": 16, "n_features_per_level": 2,
            "log2_hashmap_size": 19, "base_resolution": 16,
            "per_level_scale": 1.5, "hash": "CoherentAdditive",
            "gather_strategy": "stratified", "strata": 64,
            "phase_locked": True, "locked_phases": 1,
            "locked_rounding": ROUNDING,
        },
        "network": {"otype": "FullyFusedMLP", "n_neurons": 64,
                    "n_hidden_layers": 2},
    }, seed=1)
    trainer = model.trainer
    enc = model.model.encoding
    print("locked levels:", sorted(enc._locked_levels(64)), flush=True)
    print("level sizes:",
          [int(enc.offset_table[i + 1] - enc.offset_table[i])
           for i in range(enc.n_levels)], flush=True)
    print("scales:", [float(s) for s in enc.scales], flush=True)

    def step(state, xx, tt):
        return trainer._step_impl(state, xx, tt, None)

    t0 = time.time()
    c = jax.jit(step).lower(trainer.state, x, tgt).compile()
    print(f"compile {time.time()-t0:.0f}s", flush=True)
    state = trainer.state
    out = c(state, x, tgt)
    _ = float(jax.tree_util.tree_leaves(out)[0].ravel()[0])
    t0 = time.perf_counter()
    for _ in range(10):
        out = c(state, x, tgt)
    _ = float(jax.tree_util.tree_leaves(out)[0].ravel()[0])
    print(f"full step: {(time.perf_counter()-t0)/10*1e3:.1f} ms", flush=True)

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


if __name__ == "__main__":
    main()
