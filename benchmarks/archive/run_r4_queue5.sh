#!/bin/bash
# Round-4 TPU queue 5: 3D single-rounding protocol capture (the new 3D
# default), post-split 3D per-op attribution, and the serving raster
# per-op attribution.
cd "$(dirname "$0")/.."
L=benchmarks/logs
set -x
# A: 3D protocol with the new single-rounding default.
timeout 3600 python bench.py --protocol 3d --no-ab > $L/_r4q5_bench_3d_single.json 2> $L/_r4q5_bench_3d_single.err
# B: post-split 3D profile (locked single, slice, split auto).
timeout 3600 python benchmarks/probe_r4_3d_profile.py > $L/_r4_3d_profile.txt 2>&1
# C: serving raster profile + HLO.
timeout 3600 python benchmarks/probe_r4_serving_profile.py > $L/_r4_serving_profile.txt 2>&1
echo DONE_QUEUE5
