#!/bin/bash
# Round-5 TPU queue 6: hash-quality A/B under EMA(0.99) on the verbatim
# config body (decides whether the additive default stands).
cd /root/repo
set -x
python samples/mlp_learning_an_image.py "" \
  benchmarks/configs/config_hash_verbatim_ema.json 1000 \
  benchmarks/golden_verbatim_additive_ema \
  > benchmarks/logs/_r5q17_golden_additive_ema.txt 2>&1
echo "exit=$?" >> benchmarks/logs/_r5q17_golden_additive_ema.txt
python samples/mlp_learning_an_image.py "" \
  benchmarks/configs/config_hash_verbatim_ema_prime.json 1000 \
  benchmarks/golden_verbatim_prime_ema \
  > benchmarks/logs/_r5q17_golden_prime_ema.txt 2>&1
echo "exit=$?" >> benchmarks/logs/_r5q17_golden_prime_ema.txt
echo queue6 done
