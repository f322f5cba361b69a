#!/bin/bash
# Round-2 follow-up TPU queue: CF FFMLP kernel + in-kernel factored scatter,
# standalone then composed. One TPU process at a time; output to files.
set -x
cd "$(dirname "$0")/.."
timeout 3000 python -u benchmarks/probe_cf.py > _probe_cf.txt 2>&1; echo "cf exit=$?"
timeout 3600 python -u bench.py --layout cf > _bench_cf.txt 2>&1; echo "bench cf exit=$?"
timeout 3600 python -u bench.py --scatter-strategy factored_kernel > _bench_fk.txt 2>&1; echo "bench fk exit=$?"
timeout 3600 python -u bench.py --layout cf --scatter-strategy factored_kernel > _bench_cf_fk.txt 2>&1; echo "bench cf+fk exit=$?"
timeout 5400 python -u benchmarks/bench_mlp.py --widths 16 32 64 128 > _bench_mlp.txt 2>&1; echo "bench_mlp exit=$?"
echo QUEUE_DONE
