#!/bin/bash
# Round-3 queue 3: W-sweep dissection of the 3D locked regression,
# serving ceiling numbers, phase-locked golden PSNR, and stale-artifact
# regeneration (VERDICT r2 next-items 1, 4, 5, 7).
set -x
cd "$(dirname "$0")/.."
timeout 3600 python -u benchmarks/probe_r3b.py > _probe_r3b.txt 2>&1; echo "r3b exit=$?"
timeout 3600 python -u benchmarks/probe_serving3.py > _serving3.txt 2>&1; echo "serving3 exit=$?"
timeout 3600 python -u samples/mlp_learning_an_image.py - - 1000 benchmarks/golden_locked --phase-locked > _golden_locked.txt 2>&1; echo "golden_locked exit=$?"
timeout 3600 python -u benchmarks/bench_mlp.py --out benchmarks/bench_result_ours.json > _bench_mlp_r3.txt 2>&1; echo "bench_mlp exit=$?"
timeout 3600 python -u samples/mlp_learning_an_image.py /root/reference/data/images/albert.jpg - 1000 benchmarks/golden_albert > _golden_albert_r3.txt 2>&1; echo "golden_albert exit=$?"
timeout 2400 python -u benchmarks/probe_cf_tiles.py > _cftiles_r3.txt 2>&1; echo "cftiles exit=$?"
echo QUEUE3_DONE
