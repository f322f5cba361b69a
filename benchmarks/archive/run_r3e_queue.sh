#!/bin/bash
# Round-3 queue 5: locked-quality attribution (snapping vs rounding) and
# FrozenServer throughput.
set -x
cd "$(dirname "$0")/.."
timeout 5400 python -u benchmarks/probe_quality_ab.py > _quality_ab.txt 2>&1; echo "quality_ab exit=$?"
timeout 3600 python -u benchmarks/probe_serving4.py > _serving4.txt 2>&1; echo "serving4 exit=$?"
timeout 3600 python -u bench.py --serving > _bench_serving.txt 2>&1; echo "bench_serving exit=$?"
timeout 3600 python -u benchmarks/probe_adam_ab.py > _adam_ab.txt 2>&1; echo "adam_ab exit=$?"
echo QUEUE5_DONE
