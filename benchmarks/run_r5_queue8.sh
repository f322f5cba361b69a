#!/bin/bash
# Round-5 TPU queue 8: bench_mlp regeneration with packed TRAINING rows.
cd /root/repo
set -x
python benchmarks/bench_mlp.py \
  > benchmarks/logs/_r5q20_bench_mlp.txt 2>&1
echo "exit=$?" >> benchmarks/logs/_r5q20_bench_mlp.txt
echo queue8 done
