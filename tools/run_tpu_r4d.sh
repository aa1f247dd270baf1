#!/bin/bash
# Round-4 experiment D: line-search chunk width revisit under proj_dot.
# Hypothesis: a chunk always pays ls_chunk projections (the overshoot
# that made width 8 lose 4-5% in round 3); proj_dot cuts per-projection
# cost ~40%, so the optimum may shift wider than 4.
cd "$(dirname "$0")/.."
set -x
R=/root/repo/tools/results
ILQR_LS_CHUNK=6 BENCH_MODE=cold python bench.py \
  > $R/bench_cold_projdot_ls6.log 2>&1
ILQR_LS_CHUNK=8 BENCH_MODE=cold python bench.py \
  > $R/bench_cold_projdot_ls8.log 2>&1
echo DONE_R4D
