#!/bin/bash
# Round-3 queue 4: G-phase quality/speed decision + 3D locked-regression
# attribution + smoke gate over the new locked family.
set -x
cd "$(dirname "$0")/.."
timeout 3600 python -u samples/mlp_learning_an_image.py - - 1000 benchmarks/golden_locked --phase-locked=8 > _golden_g8.txt 2>&1; echo "golden_g8 exit=$?"
timeout 3600 python -u bench.py --sampler phase_locked > _bench_g8.txt 2>&1; echo "bench_g8 exit=$?"
timeout 5400 python -u benchmarks/probe_3d_locked2.py > _probe3dl2.txt 2>&1; echo "3dl2 exit=$?"
timeout 3600 python -u benchmarks/tpu_smoke.py > _smoke_r3d.txt 2>&1; echo "smoke exit=$?"
echo QUEUE4_DONE
