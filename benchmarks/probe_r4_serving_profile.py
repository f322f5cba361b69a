#!/usr/bin/env python
"""Per-op attribution of the 1024^2 FrozenServer raster (round 4).

The serving decomposition (probe_r4_serving / _r4_serving.txt) showed the
coarse-SEPARABLE path is essentially the whole 21 ms raster (encoding-only
20.4, coarse-only 20.5, full 21.1; MLP ~0.7 ms; the 5 fine-level gathers
compose to ~0 extra). ~20 ms for 11 static-lerp levels at 2^20 samples is
~16 GB of implied HBM traffic — far above the arithmetic's natural
footprint, so something (layout copies? f32 upsample materializations?
transposes) is burning bandwidth. Profile the composed raster program and
dump its optimized HLO so each block attributes to source.

Run ON TPU:
    python -u benchmarks/probe_r4_serving_profile.py \
        > benchmarks/logs/_r4_serving_profile.txt 2>&1
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

TRACE_DIR = "/tmp/tcnn_trace_srv"


def main():
    print("backend:", jax.default_backend(), flush=True)
    model = tc.create_from_config(2, 3, {
        "loss": {"otype": "RelativeL2"},
        "optimizer": {"otype": "Adam", "learning_rate": 1e-2, "beta2": 0.99,
                      "epsilon": 1e-15, "l2_reg": 1e-6},
        "encoding": {
            "otype": "HashGrid", "n_levels": 16, "n_features_per_level": 2,
            "log2_hashmap_size": 15, "base_resolution": 16,
            "per_level_scale": 1.5, "hash": "CoherentAdditive",
            "gather_strategy": "stratified",
        },
        "network": {"otype": "FullyFusedMLP", "n_neurons": 64,
                    "n_hidden_layers": 2},
    })
    server = model.trainer.freeze_serving()
    side = (1024, 1024)

    out = server.raster(side)
    _ = float(out.ravel()[0])
    t0 = time.perf_counter()
    for _ in range(10):
        out = server.raster(side)
    _ = float(out.ravel()[0])
    print(f"raster: {(time.perf_counter()-t0)/10*1e3:.2f} ms", flush=True)

    jax.profiler.start_trace(TRACE_DIR)
    for _ in range(3):
        out = server.raster(side)
    _ = float(out.ravel()[0])
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
    print(f"grand total {grand/3:.0f} us/raster over 3 rasters")
    print(f"{'us/rast':>9} {'n':>5}  op")
    for nm, us in sorted(totals.items(), key=lambda kv: -kv[1])[:50]:
        print(f"{us/3:9.0f} {counts[nm]:5d}  {nm[:110]}")

    # Optimized HLO with metadata for source attribution of the top ops.
    txt = None
    for key, jitted in getattr(server, "_raster_jits", {}).items():
        try:
            from tcnn_tpu.networks.fully_fused import ffmlp_inference_mode

            with ffmlp_inference_mode():
                lowered = jitted.lower(server._params, server._tables)
            txt = lowered.compile().as_text()
            break
        except Exception as e:  # noqa: BLE001
            print(f"(lower failed for key {key}: {e})", flush=True)
    if txt is None:
        print("(no HLO available)", flush=True)
        return
    out_path = Path(__file__).parent / "logs" / "_r4_serving_hlo.txt"
    out_path.write_text(txt)
    print(f"full HLO -> {out_path} ({len(txt)} bytes)", flush=True)


if __name__ == "__main__":
    main()
