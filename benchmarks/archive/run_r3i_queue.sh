#!/bin/bash
# Round-3 queue 9: 3D attribution (HLO names) + donation A/B + CSR-fwd composed.
set -x
cd "$(dirname "$0")/.."
timeout 1800 python -u benchmarks/probe_3d_hlo_names.py > /tmp/hlo_3d.txt 2>&1; echo "hlo exit=$? size=$(wc -c < /tmp/hlo_3d.txt)"
timeout 4800 python -u benchmarks/probe_3d_donate.py > _probe3ddon.txt 2>&1; echo "donate exit=$?"
# probe_3d_csrfull deliberately NOT queued: the standalone CSR forward
# measured a clear negative (probe_csr_fwd: 8.3/5.9 ms vs 5.4 gather).
echo QUEUE9_DONE
