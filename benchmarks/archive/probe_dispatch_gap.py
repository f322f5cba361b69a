#!/usr/bin/env python
"""Settle the flagship dispatch-overhead question with lane-correct numbers.

Round-3 history: probe_2d_profile2 summed ALL trace lanes whose process
name contains "TPU"/"device" — its own grand total (58.6 ms/step) exceeds
the 30 ms wall, i.e. the per-op rows are double-counted across lanes, and
the "device-busy ~10 ms/step" claim that motivated the lax.scan dispatch
(bench.py --steps-per-call) was unreliable. The scan then measured ~29
ms/step at EVERY steps-per-call vs 23.75 plain — a ~5 ms/iteration scan
tax and no dispatch overhead recovered.

This probe reports, for the exact bench-default step (locked G=1 + EMA):
  1. plain per-step dispatch wall (the 23.75 protocol),
  2. scan-block wall at n=10 (the 29 protocol),
  3. per-LANE trace totals for both (each pid/tid reported separately,
     no cross-lane summing) so true device-busy is readable, and
  4. the same plain step with donate_argnums=(0,) (the production
     trainer jit donates; the bench never did).

Run ON TPU: python -u benchmarks/probe_dispatch_gap.py > _dispatch_gap.txt 2>&1
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


def make_model():
    return tc.create_from_config(2, 3, {
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


def lane_report(trace_dir, n_steps, tag):
    files = glob.glob(trace_dir + "/**/*.trace.json.gz", recursive=True)
    if not files:
        print(f"[{tag}] no trace files", flush=True)
        return
    with gzip.open(sorted(files)[-1], "rt") as f:
        trace = json.load(f)
    events = trace.get("traceEvents", [])
    pname = {}
    tname = {}
    for e in events:
        if e.get("ph") == "M" and e.get("name") == "process_name":
            pname[e["pid"]] = e["args"].get("name", "")
        if e.get("ph") == "M" and e.get("name") == "thread_name":
            tname[(e["pid"], e.get("tid"))] = e["args"].get("name", "")
    lane_tot = defaultdict(float)
    lane_cnt = defaultdict(int)
    lane_span = {}
    for e in events:
        if e.get("ph") != "X":
            continue
        key = (e.get("pid"), e.get("tid"))
        lane = f"{pname.get(e.get('pid'), '?')} / {tname.get(key, '?')}"
        lane_tot[lane] += e.get("dur", 0.0)
        lane_cnt[lane] += 1
        ts0, ts1 = e.get("ts", 0.0), e.get("ts", 0.0) + e.get("dur", 0.0)
        if lane in lane_span:
            a, b = lane_span[lane]
            lane_span[lane] = (min(a, ts0), max(b, ts1))
        else:
            lane_span[lane] = (ts0, ts1)
    print(f"[{tag}] per-lane totals (us/step over {n_steps} steps):")
    for lane, tot in sorted(lane_tot.items(), key=lambda kv: -kv[1]):
        a, b = lane_span[lane]
        print(
            f"  {tot/n_steps:9.0f} us/step  n={lane_cnt[lane]:<6d} "
            f"span={(b-a)/1e3:8.1f} ms  {lane[:90]}"
        )
    # Top ops within the single busiest device-looking lane only.
    dev_lanes = [
        ln for ln in lane_tot
        if ("TPU" in ln or "device" in ln.lower()) and "XLA Op" in ln
    ] or [max(lane_tot, key=lambda ln: lane_tot[ln])]
    lane = max(dev_lanes, key=lambda ln: lane_tot[ln])
    tot = defaultdict(float)
    for e in events:
        if e.get("ph") != "X":
            continue
        key = (e.get("pid"), e.get("tid"))
        ln = f"{pname.get(e.get('pid'), '?')} / {tname.get(key, '?')}"
        if ln != lane:
            continue
        tot[e.get("name", "")] += e.get("dur", 0.0)
    print(f"[{tag}] top ops in lane '{lane[:70]}':")
    for nm, us in sorted(tot.items(), key=lambda kv: -kv[1])[:25]:
        print(f"  {us/n_steps:9.0f} us/step  {nm[:100]}")


def main():
    print("backend:", jax.default_backend(), flush=True)
    batch = 2**18
    res = 512
    model = make_model()
    trainer = model.trainer

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

    # --- 1. plain per-step dispatch (the 23.75 protocol) ---
    c_plain = jax.jit(bench_step).lower(
        trainer.state, jax.random.PRNGKey(0), image_dev
    ).compile()
    state = trainer.state
    keys = jax.random.split(jax.random.PRNGKey(0), 64)
    for i in range(5):
        state, loss = c_plain(state, keys[i], image_dev)
    _ = float(loss)
    t0 = time.perf_counter()
    for i in range(20):
        state, loss = c_plain(state, keys[5 + i], image_dev)
    _ = float(loss)
    plain_ms = (time.perf_counter() - t0) / 20 * 1e3
    print(f"plain per-step dispatch: {plain_ms:.2f} ms/step", flush=True)

    tdir = "/tmp/tcnn_trace_gap_plain"
    jax.profiler.start_trace(tdir)
    for i in range(4):
        state, loss = c_plain(state, keys[25 + i], image_dev)
    _ = float(loss)
    jax.profiler.stop_trace()
    lane_report(tdir, 4, "plain")

    # --- 2. donated plain per-step dispatch ---
    c_don = jax.jit(bench_step, donate_argnums=(0,)).lower(
        trainer.state, jax.random.PRNGKey(0), image_dev
    ).compile()
    state = jax.tree.map(jnp.copy, trainer.state)
    for i in range(5):
        state, loss = c_don(state, keys[i], image_dev)
    _ = float(loss)
    t0 = time.perf_counter()
    for i in range(20):
        state, loss = c_don(state, keys[5 + i], image_dev)
    _ = float(loss)
    don_ms = (time.perf_counter() - t0) / 20 * 1e3
    print(f"donated per-step dispatch: {don_ms:.2f} ms/step", flush=True)

    # --- 3. scan block n=10 (the 29 protocol), donated like training_steps ---
    def block(state, ks, img):
        def body(st, k):
            return bench_step(st, k, img)
        return jax.lax.scan(body, state, ks)

    c_scan = jax.jit(block, donate_argnums=(0,)).lower(
        trainer.state, keys[:10], image_dev
    ).compile()
    state = jax.tree.map(jnp.copy, trainer.state)
    state, losses = c_scan(state, keys[:10], image_dev)
    _ = float(losses[-1])
    t0 = time.perf_counter()
    for rep in range(3):
        state, losses = c_scan(state, keys[10:20], image_dev)
    _ = float(losses[-1])
    scan_ms = (time.perf_counter() - t0) / 30 * 1e3
    print(f"scan10 block: {scan_ms:.2f} ms/step", flush=True)

    tdir = "/tmp/tcnn_trace_gap_scan"
    jax.profiler.start_trace(tdir)
    state, losses = c_scan(state, keys[20:30], image_dev)
    _ = float(losses[-1])
    jax.profiler.stop_trace()
    lane_report(tdir, 10, "scan10")

    print("done", flush=True)


if __name__ == "__main__":
    main()
