#!/bin/bash
# Round-3 queue 13: profile the current-default 3D config (87.7 ms) and
# regenerate the locked golden under the scan-dispatch era defaults.
set -x
cd "$(dirname "$0")/.."
timeout 4800 python -u benchmarks/probe_3d_profile3.py single > _probe3dp3.txt 2>&1; echo "3dp3 exit=$?"
echo QUEUE13_DONE
