#!/bin/bash
# Round-4 experiment C: episode benchmarks with the validated proj_dot
# default (ls4 + caps 8,16,32 + proj_dot): 10-tick warm MPC + the
# reference-length 120-tick headline workload.
cd "$(dirname "$0")/.."
set -x
R=/root/repo/tools/results
BENCH_MODE=mpc BENCH_TICKS=10 BENCH_WARM=1 python bench.py \
  > $R/bench_mpc10_projdot.log 2>&1
BENCH_MODE=mpc python bench.py > $R/bench_mpc120_projdot.log 2>&1
echo DONE_R4C
