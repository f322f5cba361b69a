#!/bin/bash
# Round-5 TPU queue 4: fixed C5 select-tree rates, remaining verbatim
# strategy cases, smoke gate, post-default-flip verbatim recapture.
cd /root/repo
set -x
python benchmarks/probe_r5_pallas_gather3.py --only dyngather_sel \
  > benchmarks/logs/_r5q11_gather3_c5.txt 2>&1
echo "exit=$?" >> benchmarks/logs/_r5q11_gather3_c5.txt
python benchmarks/probe_r5_verbatim_ab.py --only G,H,I \
  > benchmarks/logs/_r5q12_verbatim_GHI.txt 2>&1
echo "exit=$?" >> benchmarks/logs/_r5q12_verbatim_GHI.txt
python -u benchmarks/probe_r5_verbatim_profile.py \
  > benchmarks/logs/_r5_verbatim_profile.txt 2>&1
echo "exit=$?" >> benchmarks/logs/_r5_verbatim_profile.txt
python benchmarks/tpu_smoke.py > benchmarks/logs/_r5q13_smoke.txt 2>&1
echo "exit=$?" >> benchmarks/logs/_r5q13_smoke.txt
python bench.py --reference-verbatim \
  > benchmarks/logs/_r5q14_refverbatim.json \
  2> benchmarks/logs/_r5q14_refverbatim.err
echo "exit=$?" >> benchmarks/logs/_r5q14_refverbatim.err
echo queue4 done
