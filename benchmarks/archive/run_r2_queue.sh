#!/bin/bash
# Sequential TPU measurement queue for round 2 (one TPU process at a time).
# Run from repo root: bash benchmarks/run_r2_queue.sh
set -x
cd "$(dirname "$0")/.."
timeout 3000 python -u benchmarks/tpu_smoke.py > _smoke.txt 2>&1; echo "smoke exit=$?"
timeout 2400 python -u benchmarks/probe_pair1.py > _probe_pair1.txt 2>&1; echo "pair1 exit=$?"
timeout 3600 python -u benchmarks/probe_tdtype.py > _probe_tdtype.txt 2>&1; echo "tdtype exit=$?"
timeout 2400 python -u benchmarks/probe_serving_stream.py > _probe_stream.txt 2>&1; echo "stream exit=$?"
timeout 3600 python -u bench.py > _bench_auto.txt 2>&1; echo "bench auto exit=$?"
timeout 3600 python -u bench.py --scatter-strategy factored_fused > _bench_fused.txt 2>&1; echo "bench fused exit=$?"
echo QUEUE_DONE
