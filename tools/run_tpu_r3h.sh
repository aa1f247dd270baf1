#!/bin/bash
# Round-3 experiment H: (1) ls_chunk width refinement around the measured
# optimum 4 (cold bench), (2) a second reference-length episode scenario:
# scenario_three_straight (150 ticks, use_last_solution=true in the yaml).
cd "$(dirname "$0")/.."
set -x
ILQR_LS_CHUNK=5 BENCH_MODE=cold python bench.py \
  > tools/results/bench_cold_ls5.log 2>&1
ILQR_LS_CHUNK=3 BENCH_MODE=cold python bench.py \
  > tools/results/bench_cold_ls3.log 2>&1
python tools/bench_mpc_chunked.py --scenario scenario_three_straight \
  --batch 8192 --reps 3 > tools/results/bench_chunked_150_three.log 2>&1
echo DONE_R3H
