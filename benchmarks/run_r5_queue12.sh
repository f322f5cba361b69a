#!/bin/bash
cd /root/repo
set -x
python bench.py --reference-verbatim --split-state on \
  > benchmarks/logs/_r5q26_verbatim_split.json \
  2> benchmarks/logs/_r5q26_verbatim_split.err
echo "exit=$?" >> benchmarks/logs/_r5q26_verbatim_split.err
echo queue12 done
