#!/usr/bin/env python
"""Profile the 3D encoding backward (xla_half) and print top ops.

Parses the chrome-trace json the jax profiler writes — no tensorboard
needed. Run ON TPU:
    python -u benchmarks/probe_3d_profile.py > _probe3d_profile.txt 2>&1
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
from tcnn_tpu.rng import PCG32  # noqa: E402

TRACE_DIR = "/tmp/tcnn_trace_3d"


def main():
    print("backend:", jax.default_backend(), flush=True)
    r = np.random.default_rng(0)
    batch = 2**18
    xyz = jnp.asarray(r.uniform(0, 1, (batch, 3)).astype(np.float32))
    enc = tc.create_encoding(3, {
        "otype": "HashGrid", "n_levels": 16, "n_features_per_level": 2,
        "log2_hashmap_size": 19, "base_resolution": 16,
        "per_level_scale": 1.5, "hash": "CoherentAdditive",
        "gather_strategy": "quad", "scatter_strategy": "xla_half",
    })
    params = jnp.asarray(enc.initialize_params(PCG32(7)))

    def enc_bwd(p, x):
        return jax.grad(
            lambda q: (enc.apply(q, x).astype(jnp.float32) ** 2).sum()
        )(p).sum()

    c = jax.jit(enc_bwd).lower(params, xyz).compile()
    out = c(params, xyz)
    _ = float(out)
    t0 = time.perf_counter()
    for _ in range(5):
        out = c(params, xyz)
    _ = float(out)
    print(f"enc_bwd[xla_half]: {(time.perf_counter()-t0)/5*1e3:.1f} ms",
          flush=True)

    jax.profiler.start_trace(TRACE_DIR)
    for _ in range(3):
        out = c(params, xyz)
    _ = float(out)
    jax.profiler.stop_trace()

    files = glob.glob(TRACE_DIR + "/**/*.trace.json.gz", recursive=True)
    print("trace files:", files, flush=True)
    if not files:
        return
    with gzip.open(sorted(files)[-1], "rt") as f:
        trace = json.load(f)
    events = trace.get("traceEvents", [])
    # Find device-track pids (TPU core tracks contain "TPU" or "/device:").
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
        # Skip the top-level module event (covers everything).
        nm = e.get("name", "")
        if nm.startswith("jit_"):
            continue
        totals[nm] += e.get("dur", 0.0)
        counts[nm] += 1
    print(f"\ndevice tracks: {sorted(set(name_by_pid.values()))}")
    print(f"{'total_us':>10} {'n':>5}  op")
    for nm, us in sorted(totals.items(), key=lambda kv: -kv[1])[:40]:
        print(f"{us:10.0f} {counts[nm]:5d}  {nm[:110]}")


if __name__ == "__main__":
    main()
