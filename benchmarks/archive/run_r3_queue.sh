#!/bin/bash
# Sequential TPU measurement queue for round 3 (one TPU process at a time).
# Run from repo root: bash benchmarks/run_r3_queue.sh
set -x
cd "$(dirname "$0")/.."
timeout 3600 python -u benchmarks/probe_r3_static.py > _probe_r3.txt 2>&1; echo "r3_static exit=$?"
timeout 3600 python -u bench.py > _bench_r3.txt 2>&1; echo "bench exit=$?"
timeout 3600 python -u benchmarks/probe_3d_decomp.py > _probe3d_r3.txt 2>&1; echo "3d exit=$?"
timeout 3000 python -u benchmarks/tpu_smoke.py > _smoke_r3.txt 2>&1; echo "smoke exit=$?"
timeout 3600 python -u benchmarks/bench_flax_baseline.py > _flax_r3.txt 2>&1; echo "flax exit=$?"
timeout 2400 python -u benchmarks/probe_cf_tiles.py > _cftiles_r3.txt 2>&1; echo "cftiles exit=$?"
echo QUEUE_DONE
