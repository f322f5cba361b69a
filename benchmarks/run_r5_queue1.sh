#!/bin/bash
# Round-5 TPU queue 1: gather bound isolation + verbatim strategy A/B.
# One TPU process at a time (the tunnel serializes; timings lie otherwise).
cd /root/repo
set -x
python benchmarks/probe_r5_pallas_gather3.py \
  > benchmarks/logs/_r5q5_gather3.txt 2>&1
echo "exit=$?" >> benchmarks/logs/_r5q5_gather3.txt
python benchmarks/probe_r5_verbatim_ab.py \
  > benchmarks/logs/_r5q6_verbatim_ab.txt 2>&1
echo "exit=$?" >> benchmarks/logs/_r5q6_verbatim_ab.txt
echo queue1 done
