#!/bin/bash
# Round-3 queue 12: scanned-dispatch flagship headline.
# probe_2d_profile2 found device-busy ~10 ms/step vs ~24 ms wall: the
# per-dispatch tunnel/launch latency dominates the locked 2D step and
# sequential train steps cannot pipeline. bench.py now scans
# --steps-per-call steps per dispatch (default 10).
set -x
cd "$(dirname "$0")/.."
timeout 5400 python -u bench.py > _bench_scan10.txt 2>&1; echo "scan10 exit=$?"
timeout 3600 python -u bench.py --steps-per-call 1 > _bench_scan1.txt 2>&1; echo "scan1 exit=$?"
timeout 3600 python -u bench.py --steps-per-call 25 > _bench_scan25.txt 2>&1; echo "scan25 exit=$?"
timeout 5400 python -u bench.py --protocol 3d --locked-rounding single > _bench_3d_scan.txt 2>&1; echo "bench3d exit=$?"
echo QUEUE12_DONE
