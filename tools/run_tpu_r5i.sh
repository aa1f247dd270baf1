#!/bin/bash
# Round-5 experiment I: two cheap frontier probes at the shipped defaults.
#  1. projection factor 1.0 (rows/step = exactly the target speed; the
#     round8 vreg rounding grants up to +7 rows of headroom);
#  2. batch 16384 (cold + episodes) -- dispatch amortization plateaued
#     at 8192 in round 4; the cheaper per-solve kernel may shift it.
cd "$(dirname "$0")/.."
set -x
R=/root/repo/tools/results
BENCH_MODE=cold BENCH_PROJ=8 python bench.py > $R/bench_cold_r5_proj8.log 2>&1
BENCH_MODE=cold BENCH_BATCH=16384 python bench.py > $R/bench_cold_r5_b16384.log 2>&1
BENCH_BATCH=16384 python bench.py > $R/bench_mpc_r5_b16384.log 2>&1
echo DONE_R5I
