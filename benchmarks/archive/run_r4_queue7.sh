#!/bin/bash
# Round-4 TPU queue 7: the stratified-SR default flip's evidence set.
#   A: on-device Mosaic smoke gate (verify leg).
#   B: DEFAULT bench command with the new stratified+factored_sr+EMA
#      primary and the phase-locked secondary, back-to-back A/B.
#   C: albert.jpg real-image golden on the new default config.
cd "$(dirname "$0")/.."
L=benchmarks/logs
set -x
timeout 1800 python benchmarks/tpu_smoke.py > $L/_r4q11_smoke.txt 2>&1
echo "smoke exit=$?"
timeout 3600 python bench.py \
  > $L/_r4q11_bench_default.json 2> $L/_r4q11_bench_default.err
timeout 3600 python samples/mlp_learning_an_image.py \
  /root/reference/data/images/albert.jpg \
  benchmarks/configs/config_hash_strat_sr_ema.json 1000 \
  benchmarks/golden_albert_sr > $L/_r4q11_albert_sr.txt 2>&1
echo DONE_QUEUE7
