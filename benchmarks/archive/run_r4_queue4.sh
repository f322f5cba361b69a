#!/bin/bash
# Round-4 TPU queue 4: level_split composed A/B (2D flagship + 3D), smoke
# gate under the new default, and a fresh HLO profile of the 3D step.
# One TPU process at a time; all output to files (no pipes — tunnel rule).
cd "$(dirname "$0")/.."
L=benchmarks/logs
set -x
# A: 2D flagship default (locked+EMA, level_split auto) + stratified
#    secondary in the same session.
timeout 3600 python bench.py > $L/_r4q4_bench_2d_split.json 2> $L/_r4q4_bench_2d_split.err
# B: 2D with level_split OFF (the A/B control).
timeout 3600 python bench.py --no-ab --level-split off > $L/_r4q4_bench_2d_off.json 2> $L/_r4q4_bench_2d_off.err
# C: 3D default (split auto).
timeout 3600 python bench.py --protocol 3d --no-ab > $L/_r4q4_bench_3d_split.json 2> $L/_r4q4_bench_3d_split.err
# D: 3D with level_split OFF.
timeout 3600 python bench.py --protocol 3d --no-ab --level-split off > $L/_r4q4_bench_3d_off.json 2> $L/_r4q4_bench_3d_off.err
# E: smoke gate under the new default.
timeout 3600 python benchmarks/tpu_smoke.py > $L/_r4q4_smoke.txt 2>&1
echo "smoke exit=$?" >> $L/_r4q4_smoke.txt
echo DONE_QUEUE4
