#!/bin/bash
# Round-5 experiment F: projection-slack sweep. With the target-velocity
# bound shipped (proj_rows 9 on the bench scenario), row_limits[k] =
# round8(w_back + slack + 9k); the 48-row slack buffers sustained
# over-target speeds (covers ~v=10.6 m/s sustained vs the 8.8 bound).
# Sweep 32/24/16 on the cold bench; the winner (if any) then needs the
# four-scenario anchor validation before shipping.
cd "$(dirname "$0")/.."
set -x
R=/root/repo/tools/results
for sl in 32 24 16; do
  ILQR_PROJ_SLACK=$sl BENCH_MODE=cold python bench.py \
    > $R/bench_cold_r5_slack$sl.log 2>&1
done
echo DONE_R5F
