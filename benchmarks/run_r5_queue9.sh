#!/bin/bash
# Round-5 TPU queue 9: bench_mlp regeneration with block dispersion
# (programs cached; pure timing).
cd /root/repo
set -x
python benchmarks/bench_mlp.py \
  > benchmarks/logs/_r5q21_bench_mlp_blocks.txt 2>&1
echo "exit=$?" >> benchmarks/logs/_r5q21_bench_mlp_blocks.txt
echo queue9 done
