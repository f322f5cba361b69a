#!/bin/bash
# Round-5 TPU queue 2: fixed gather bound isolation + 3D split-state
# driver-command capture.
cd /root/repo
set -x
python benchmarks/probe_r5_pallas_gather3.py \
  > benchmarks/logs/_r5q7_gather3_fixed.txt 2>&1
echo "exit=$?" >> benchmarks/logs/_r5q7_gather3_fixed.txt
python benchmarks/probe_r5_verbatim_ab.py --only E,F \
  > benchmarks/logs/_r5q7b_verbatim_EF.txt 2>&1
echo "exit=$?" >> benchmarks/logs/_r5q7b_verbatim_EF.txt
python bench.py --protocol 3d --split-state \
  > benchmarks/logs/_r5q8_bench_3d_split.json \
  2> benchmarks/logs/_r5q8_bench_3d_split.err
echo "exit=$?" >> benchmarks/logs/_r5q8_bench_3d_split.err
echo queue2 done
