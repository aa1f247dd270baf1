#!/bin/bash
# Round-3 experiment G: pick the production ls_chunk default.
# ls_chunk=4 won cold (+13%, bench_cold_ls4.log); measure it on the MPC
# episode paths, then bench the plain default configuration (the BENCH_r03
# shape) with the winner.
cd "$(dirname "$0")/.."
set -x
# 1. 10-tick warm MPC with ls4 (vs 54.0k serial, bench_mpc_cap81632_warm.log)
ILQR_LS_CHUNK=4 BENCH_MODE=mpc BENCH_TICKS=10 BENCH_WARM=1 BENCH_BATCH=8192 \
  python bench.py > tools/results/bench_mpc_ls4_warm.log 2>&1
# 2. plain default (120-tick chunked warm episodes) with ls4
ILQR_LS_CHUNK=4 python bench.py > tools/results/bench_default_ls4.log 2>&1
# 3. plain default, serial line search (reproduces r3c's 117.8k)
ILQR_LS_CHUNK=0 python bench.py > tools/results/bench_default_serial.log 2>&1

# (appended) 4. sweep with the jitted solve+aggregation (relay fix):
# record the real kernel-engine sweep throughput
python -m ilqr_tpu.apps.sweep -c configs/scenario_two_straight.yaml \
  --batch 2048 --steps 4 --engine kernel \
  > tools/results/sweep_fixed_r3.log 2>&1
echo DONE_R3G2
