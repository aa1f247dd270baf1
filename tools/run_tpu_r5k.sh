#!/bin/bash
# Round-5 experiment K: re-probe old tradeoffs at the new projection
# economics. ls_chunk width 4 beat 6/8 when trial projections cost 29%
# of step time; with the bound they cost 18%, so chunk overshoot is
# cheaper -- revisit widths. w_back 24 -> 16 likewise saves 8 rows/step
# of scanned window (~4%) if the behind-window coverage still holds.
cd "$(dirname "$0")/.."
set -x
R=/root/repo/tools/results
ILQR_LS_CHUNK=6 BENCH_MODE=cold python bench.py > $R/bench_cold_r5_ls6.log 2>&1
ILQR_LS_CHUNK=8 BENCH_MODE=cold python bench.py > $R/bench_cold_r5_ls8.log 2>&1
BENCH_WBACK=16 BENCH_MODE=cold python bench.py > $R/bench_cold_r5_wb16.log 2>&1
echo DONE_R5K
