#!/bin/bash
# Round-3 queue 2: phase-locked composed measurements + stale-artifact
# regeneration (VERDICT r2 next-items 1, 3, 5).
set -x
cd "$(dirname "$0")/.."
timeout 3600 python -u bench.py --sampler phase_locked > _bench_locked.txt 2>&1; echo "bench_locked exit=$?"
timeout 3600 python -u benchmarks/probe_3d_locked.py > _probe3dl.txt 2>&1; echo "3d_locked exit=$?"
timeout 3600 python -u samples/mlp_learning_an_image.py - - 1000 benchmarks/golden_locked --phase-locked > _golden_locked.txt 2>&1; echo "golden_locked exit=$?"
timeout 3600 python -u benchmarks/bench_mlp.py --out benchmarks/bench_result_ours.json > _bench_mlp_r3.txt 2>&1; echo "bench_mlp exit=$?"
timeout 3600 python -u samples/mlp_learning_an_image.py /root/reference/data/images/albert.jpg - 1000 benchmarks/golden_albert > _golden_albert_r3.txt 2>&1; echo "golden_albert exit=$?"
echo QUEUE2_DONE
