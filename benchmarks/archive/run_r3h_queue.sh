#!/bin/bash
# Round-3 queue 8: 3D attack — CSR forward A/B, coarse-static variants=2.
set -x
cd "$(dirname "$0")/.."
timeout 2400 python -u benchmarks/probe_csr_fwd.py > _csr_fwd.txt 2>&1; echo "csr_fwd exit=$?"
timeout 4800 python -u benchmarks/probe_3d_variants.py > _probe3dv.txt 2>&1; echo "3dv exit=$?"
echo QUEUE8_DONE
