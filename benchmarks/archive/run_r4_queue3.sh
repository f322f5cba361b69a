#!/bin/bash
# Round-4 TPU queue 3: validate the canary unroll fix + the 3D batch-gen
# optimization_barrier fix + the restructured serial kernel.
# One TPU process at a time; all output to files (no pipes — tunnel rule).
cd "$(dirname "$0")/.."
L=benchmarks/logs
set -x
# A: Mosaic smoke gate — factored_kernel_adam / cf_layout_kernel_sr should
#    now be green (scatter_rows_factored_pallas default unroll False).
timeout 3600 python benchmarks/tpu_smoke.py > $L/_r4q3_smoke.txt 2>&1
echo "smoke exit=$?" >> $L/_r4q3_smoke.txt
# B: 3D bench with the batch-gen optimization_barrier (expect ~80 ms,
#    was 138.9).
timeout 3600 python bench.py --protocol 3d --no-ab > $L/_r4q3_bench_3d.json 2> $L/_r4q3_bench_3d.err
# C: sliced VMEM kernels under the new defaults (3D factored sliced with
#    fori_loop chunks; serial RMW with the flat single-loop kernel).
timeout 5400 python benchmarks/probe_r4_sliced.py > $L/_r4q3_sliced.txt 2>&1
echo DONE_QUEUE3
