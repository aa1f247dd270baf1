#!/bin/bash
# Round-5 experiment B: incremental/trial-projection bound study
# (VERDICT r4 item #3). The reference's start_index monotone walk
# (src/cilqr_solver.cpp:289-314) needs a per-(lane, step) dynamic window,
# which Mosaic cannot express (no per-lane sublane gather -- NOTES.md);
# the TPU-realizable remnant is tightening the STATIC per-step search
# bound row_limits[k] = w_back + slack + k * proj_rows. The shipped
# proj_rows = ceil(1.5 * vmax * dt / 0.1) = 23 (two_straight) assumes
# every row drives at 1.5x the speed limit; actual episode speeds are
# <= 8.5 m/s, so proj_rows in {15, 11, 9} covers 1.0x/0.73x/0.6x vmax.
# Statistical mode: a binding bound only raises a trial's cost, so the
# f64-anchor validation of the best candidate decides shippability.
cd "$(dirname "$0")/.."
set -x
R=/root/repo/tools/results
# baseline (proj_rows=23) = bench_cold_r5_quirk.log from run_tpu_r5a.sh
for pr in 15 11 9; do
  BENCH_MODE=cold BENCH_PROJ=$pr python bench.py \
    > $R/bench_cold_r5_proj$pr.log 2>&1
done
echo DONE_R5B
