#!/bin/bash
# Round-5 TPU queue 10: final-tree validation — smoke, default 2D bench,
# serving capture.
cd /root/repo
set -x
python benchmarks/tpu_smoke.py > benchmarks/logs/_r5q22_smoke.txt 2>&1
echo "exit=$?" >> benchmarks/logs/_r5q22_smoke.txt
python bench.py > benchmarks/logs/_r5q23_bench_default.json \
  2> benchmarks/logs/_r5q23_bench_default.err
echo "exit=$?" >> benchmarks/logs/_r5q23_bench_default.err
python bench.py --serving > benchmarks/logs/_r5q24_bench_serving.json \
  2> benchmarks/logs/_r5q24_bench_serving.err
echo "exit=$?" >> benchmarks/logs/_r5q24_bench_serving.err
echo queue10 done
