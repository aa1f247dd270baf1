#!/bin/bash
# Round-3 experiment D: per-tick straggler schedules (cold first tick
# 8,16,32 + warm ticks lower), and the cold-solve w_back trim experiment.
cd "$(dirname "$0")/.."
set -x
# 1. per-tick schedule on the 10-tick MPC bench (warm ticks 4,8,16)
BENCH_MODE=mpc BENCH_CAP=8,16,32 BENCH_CAP_WARM=4,8,16 BENCH_BATCH=8192 \
  BENCH_TICKS=10 BENCH_WARM=1 \
  python bench.py > tools/results/bench_mpc_pertick_4816.log 2>&1
# 2. w_back trim: validate 24-row backing on all four scenarios, then bench
python tools/validate_kernel_tpu.py --w-back 24 --proj-rows -1 \
  > tools/results/val_wback24.log 2>&1
BENCH_WBACK=24 python bench.py > tools/results/bench_cold_wback24.log 2>&1
echo DONE_R3D
