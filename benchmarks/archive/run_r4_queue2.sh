#!/bin/bash
# Round-4 TPU queue 2: slice-default headline capture, gap bisect, the
# sliced VMEM kernel probes, serving decomposition, albert locked golden.
# One TPU process at a time; all output to files (no pipes — tunnel rule).
cd "$(dirname "$0")/.."
L=benchmarks/logs
set -x
# 0: on-device Mosaic smoke gate under the new slice default.
timeout 3600 python benchmarks/tpu_smoke.py > $L/_r4_smoke.txt 2>&1
echo "smoke exit=$?" >> $L/_r4_smoke.txt
# A: flagship 2D default — quad_build auto is now "slice"; captures the
#    locked headline + back-to-back stratified secondary (VERDICT next-2).
timeout 3600 python bench.py > $L/_r4q2_bench_2d.json 2> $L/_r4q2_bench_2d.err
# B: 3D default (pair rounding) under the slice build — the missing cell.
timeout 3600 python bench.py --protocol 3d --no-ab > $L/_r4q2_bench_3d_pair.json 2> $L/_r4q2_bench_3d_pair.err
# C: bench-vs-probe gap bisect (EMA / in-graph gen / targets) both dims.
timeout 5400 python benchmarks/probe_r4_gap.py both > $L/_r4_gap.txt 2>&1
# D: sliced VMEM-resident scatter kernels (VERDICT next-3).
timeout 5400 python benchmarks/probe_r4_sliced.py > $L/_r4_sliced.txt 2>&1
# E: serving decomposition at 1024^2 (VERDICT next-6).
timeout 5400 python benchmarks/probe_r4_serving.py > $L/_r4_serving.txt 2>&1
# F: albert.jpg with the shipped locked+EMA default (VERDICT next-4).
timeout 3600 python samples/mlp_learning_an_image.py \
  /root/reference/data/images/albert.jpg - 1000 \
  benchmarks/golden_albert_locked --phase-locked \
  > $L/_r4_albert_locked.txt 2>&1
echo DONE_QUEUE2
