#!/bin/bash
# Round-5 TPU queue 7: smoke with the new packed/split cases + 3D bf16
# forward-table A/B.
cd /root/repo
set -x
python benchmarks/tpu_smoke.py > benchmarks/logs/_r5q18_smoke.txt 2>&1
echo "exit=$?" >> benchmarks/logs/_r5q18_smoke.txt
python bench.py --protocol 3d --table-dtype bfloat16 \
  > benchmarks/logs/_r5q19_bench_3d_bf16.json \
  2> benchmarks/logs/_r5q19_bench_3d_bf16.err
echo "exit=$?" >> benchmarks/logs/_r5q19_bench_3d_bf16.err
echo queue7 done
