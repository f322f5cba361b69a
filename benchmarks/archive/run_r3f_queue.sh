#!/bin/bash
# Round-3 queue 6: EMA-vs-phase-dither quality test, fixed 3D attribution,
# serving gather-structure A/B.
set -x
cd "$(dirname "$0")/.."
timeout 5400 python -u benchmarks/probe_quality_ab2.py > _quality_ab2.txt 2>&1; echo "quality_ab2 exit=$?"
timeout 7200 python -u benchmarks/probe_3d_locked2.py > _probe3dl2b.txt 2>&1; echo "3dl2b exit=$?"
timeout 3600 python -u benchmarks/probe_serving5.py > _serving5.txt 2>&1; echo "serving5 exit=$?"
timeout 3600 python -u benchmarks/probe_locked_fwd.py > _locked_fwd.txt 2>&1; echo "locked_fwd exit=$?"
echo QUEUE6_DONE
