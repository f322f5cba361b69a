#!/bin/bash
# Round-5 TPU queue 5: hash-quality golden A/B (default CoherentAdditive
# vs reference CoherentPrime on the untouched config body) + final-tree
# default bench capture.
cd /root/repo
set -x
python samples/mlp_learning_an_image.py "" \
  benchmarks/configs/config_hash_verbatim.json 1000 \
  benchmarks/golden_verbatim_additive \
  > benchmarks/logs/_r5q15_golden_additive.txt 2>&1
echo "exit=$?" >> benchmarks/logs/_r5q15_golden_additive.txt
python samples/mlp_learning_an_image.py "" \
  benchmarks/configs/config_hash_verbatim_prime.json 1000 \
  benchmarks/golden_verbatim_prime \
  > benchmarks/logs/_r5q15_golden_prime.txt 2>&1
echo "exit=$?" >> benchmarks/logs/_r5q15_golden_prime.txt
python bench.py > benchmarks/logs/_r5q16_bench_default.json \
  2> benchmarks/logs/_r5q16_bench_default.err
echo "exit=$?" >> benchmarks/logs/_r5q16_bench_default.err
echo queue5 done
