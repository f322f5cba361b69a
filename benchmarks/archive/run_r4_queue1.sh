#!/bin/bash
# Round-4 TPU queue 1: bench reproducibility capture + quad_build slice A/B.
# One TPU process at a time; all output to files (no pipes — tunnel rule).
cd "$(dirname "$0")/.."
L=benchmarks/logs
set -x
# A: flagship 2D default (locked+EMA) + back-to-back stratified secondary,
#    median-of-5 blocks — the VERDICT next-2 reproducibility capture.
timeout 3600 python bench.py > $L/_r4_bench_2d_ab.json 2> $L/_r4_bench_2d_ab.err
# B: 3D current default (pair rounding, view build)
timeout 3600 python bench.py --protocol 3d --no-ab > $L/_r4_bench_3d_pair_view.json 2> $L/_r4_bench_3d_pair_view.err
# C: 3D slice build
timeout 3600 python bench.py --protocol 3d --no-ab --quad-build slice > $L/_r4_bench_3d_pair_slice.json 2> $L/_r4_bench_3d_pair_slice.err
# D: 3D single rounding, view build (the r3 87.7 ms probe regime)
timeout 3600 python bench.py --protocol 3d --no-ab --locked-rounding single > $L/_r4_bench_3d_single_view.json 2> $L/_r4_bench_3d_single_view.err
# E: 3D single + slice (the round-4 candidate default)
timeout 3600 python bench.py --protocol 3d --no-ab --locked-rounding single --quad-build slice > $L/_r4_bench_3d_single_slice.json 2> $L/_r4_bench_3d_single_slice.err
# F: 2D locked + slice
timeout 3600 python bench.py --no-ab --quad-build slice > $L/_r4_bench_2d_slice.json 2> $L/_r4_bench_2d_slice.err
# G: 2D stratified + slice (res-922 relayout attack, VERDICT next-5)
timeout 3600 python bench.py --no-ab --sampler stratified --quad-build slice > $L/_r4_bench_2d_strat_slice.json 2> $L/_r4_bench_2d_strat_slice.err
echo DONE_QUEUE1
