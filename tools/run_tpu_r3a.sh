#!/bin/bash
# Round-3 experiment A: MPC bench with the multi-phase straggler schedule
# (the cold bench's +44% was never applied to BENCH_MODE=mpc, which still
# ran single cap 24 -- VERDICT round 2 weak #2).
cd "$(dirname "$0")/.."
set -x
BENCH_MODE=mpc BENCH_CAP=8,16,32 BENCH_BATCH=8192 BENCH_TICKS=10 \
  python bench.py > tools/results/bench_mpc_cap81632.log 2>&1
BENCH_MODE=mpc BENCH_CAP=8,16,32 BENCH_BATCH=8192 BENCH_TICKS=10 BENCH_WARM=1 \
  python bench.py > tools/results/bench_mpc_cap81632_warm.log 2>&1
echo DONE_R3A
