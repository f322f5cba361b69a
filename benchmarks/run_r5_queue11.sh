#!/bin/bash
cd /root/repo
set -x
python benchmarks/probe_r5_verbatim_ab.py --only J \
  > benchmarks/logs/_r5q25_verbatim_J.txt 2>&1
echo "exit=$?" >> benchmarks/logs/_r5q25_verbatim_J.txt
echo queue11 done
