#!/bin/bash
# Round-4 TPU queue 6: close VERDICT r3 next-5 on both branches.
#   A: bench timing of stratified + factored_sr + EMA(0.99) — the SR
#      golden (46.44 dB, no EMA) missed the 47+ bar; EMA lifted the
#      stratified control +5.9 dB in round 3 at ~zero step cost.
#   B: 1000-step golden of the same config (quality number).
#   C: per-op attribution + HLO of the stratified-PAIR step (the
#      25.9 ms reference-exact-geometry mode) — the floor-proof branch.
cd "$(dirname "$0")/.."
L=benchmarks/logs
set -x
timeout 3600 python bench.py --sampler stratified --scatter-strategy factored_sr \
  --ema 0.99 --no-ab > $L/_r4q10_bench_sr_ema.json 2> $L/_r4q10_bench_sr_ema.err
timeout 3600 python samples/mlp_learning_an_image.py "" \
  benchmarks/configs/config_hash_strat_sr_ema.json 1000 \
  $L/_r4q10_golden_sr_ema > $L/_r4q10_golden_sr_ema.txt 2>&1
timeout 3600 python -u benchmarks/probe_r4_strat_profile.py \
  > $L/_r4_strat_profile.txt 2>&1
echo DONE_QUEUE6
