#!/bin/bash
# Round-5 TPU queue 3: MLP bench regeneration (incl. packed-I/O rows at
# widths 16-64) + w128 inference tile sweep.
cd /root/repo
set -x
python benchmarks/bench_mlp.py --widths 16 32 64 128 \
  > benchmarks/logs/_r5q9_bench_mlp.txt 2>&1
echo "exit=$?" >> benchmarks/logs/_r5q9_bench_mlp.txt
python benchmarks/probe_r5_w128_tiles.py \
  > benchmarks/logs/_r5q10_w128_tiles.txt 2>&1
echo "exit=$?" >> benchmarks/logs/_r5q10_w128_tiles.txt
echo queue3 done
