#!/bin/bash
# Round-3 queue 11: 3D composed with the flat quad-table build (new
# default for d=3) — expect the ~24 ms of (N,2)-view layout traffic
# (probe_3d_profile2 attribution) to largely disappear.
set -x
cd "$(dirname "$0")/.."
timeout 4800 python -u benchmarks/probe_3d_final.py single/unpacked pair/unpacked > _probe3df2.txt 2>&1; echo "3df2 exit=$?"
echo QUEUE11_DONE
