#!/bin/bash
# Round-3 queue 7: lock in the flagship fast mode (locked G=1 + EMA) —
# bench headline, locked-single speed/quality point, golden regeneration,
# NeRF served-render number.
set -x
cd "$(dirname "$0")/.."
timeout 3600 python -u bench.py --sampler phase_locked --ema 0.99 > _bench_locked_ema.txt 2>&1; echo "bench_locked_ema exit=$?"
timeout 3600 python -u bench.py --sampler phase_locked --ema 0.99 --locked-rounding single > _bench_locked_single.txt 2>&1; echo "bench_locked_single exit=$?"
timeout 3600 python -u bench.py --sampler phase_locked --ema 0.99 --locked-fwd packed > _bench_locked_packedfwd.txt 2>&1; echo "bench_locked_packedfwd exit=$?"
timeout 3600 python -u samples/mlp_learning_an_image.py - - 1000 benchmarks/golden_locked --phase-locked > _golden_locked_ema.txt 2>&1; echo "golden_locked_ema exit=$?"
timeout 3600 python -u samples/nerf_synthetic.py 600 8192 > _nerf_r3.txt 2>&1; echo "nerf exit=$?"
timeout 5400 python -u benchmarks/probe_3d_final.py > _probe3df.txt 2>&1; echo "3df exit=$?"
echo QUEUE7_DONE
