#!/bin/bash
# Round-3 experiment B: chunked reference-length episodes on chip,
# warm-tuned cap schedules, miscompile canary.
cd "$(dirname "$0")/.."
set -x
# 1. chunked-vs-host bitwise check on hardware (20 ticks, batch 1024)
python tools/bench_mpc_chunked.py --check --batch 1024 --warm \
  > tools/results/chunked_check_tpu.log 2>&1
# 2. full reference-length episode (120 ticks) benchmark, batch 1024 + 8192
python tools/bench_mpc_chunked.py --batch 1024 --warm \
  > tools/results/bench_chunked_120_b1024.log 2>&1
python tools/bench_mpc_chunked.py --batch 8192 --warm \
  > tools/results/bench_chunked_120_b8192.log 2>&1
# 3. warm cap-schedule tuning
BENCH_MODE=mpc BENCH_CAP=4,8,16 BENCH_BATCH=8192 BENCH_TICKS=10 BENCH_WARM=1 \
  python bench.py > tools/results/bench_mpc_cap4816_warm.log 2>&1
BENCH_MODE=mpc BENCH_CAP=4,8,16,32 BENCH_BATCH=8192 BENCH_TICKS=10 BENCH_WARM=1 \
  python bench.py > tools/results/bench_mpc_cap481632_warm.log 2>&1
# 4. miscompile-family canary
python tools/xla_canary.py > tools/results/xla_canary.log 2>&1
echo DONE_R3B
