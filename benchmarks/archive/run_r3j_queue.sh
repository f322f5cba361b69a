#!/bin/bash
# Round-3 queue 10: 2D locked profile + flax referee regeneration.
set -x
cd "$(dirname "$0")/.."
timeout 3600 python -u benchmarks/probe_2d_profile2.py > _probe2dp2.txt 2>&1; echo "2dp2 exit=$?"
timeout 5400 python -u benchmarks/bench_flax_baseline.py > _flax_bench.txt 2>&1; echo "flax exit=$?"
echo QUEUE10_DONE
