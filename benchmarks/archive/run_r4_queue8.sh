#!/bin/bash
# Round-4 TPU queue 8: same-round recaptures of the two secondary
# headline numbers with the current tree (programs unchanged -> warm
# cache): the 3D NeRF-scale protocol and the frozen-serving raster.
cd "$(dirname "$0")/.."
L=benchmarks/logs
set -x
timeout 3600 python bench.py --protocol 3d --no-ab \
  > $L/_r4q12_bench_3d.json 2> $L/_r4q12_bench_3d.err
timeout 3600 python bench.py --serving \
  > $L/_r4q12_bench_serving.json 2> $L/_r4q12_bench_serving.err
echo DONE_QUEUE8
