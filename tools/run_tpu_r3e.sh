#!/bin/bash
# Round-3 experiment E: (1) redo the w_back-24 trim steps that died on the
# _os shadowing bug, (2) validate + bench the chunked packed-alpha line
# search (ls_chunk=8) on hardware.
cd "$(dirname "$0")/.."
set -x
# 1. on-chip bitwise check serial vs packed at bench shapes (the
#    miscompile canary for the new code path) + steady-state timing
python tools/check_ls_chunk_tpu.py --batch 2048 \
  > tools/results/check_ls_chunk.log 2>&1
# 2. packed cold bench at full batch
ILQR_LS_CHUNK=8 python bench.py > tools/results/bench_cold_ls8.log 2>&1
# 3. packed MPC bench (10-tick, warm)
ILQR_LS_CHUNK=8 BENCH_MODE=mpc BENCH_BATCH=8192 BENCH_TICKS=10 BENCH_WARM=1 \
  python bench.py > tools/results/bench_mpc_ls8_warm.log 2>&1
# 4. w_back trim: validate 24-row backing on all four scenarios, then bench
python tools/validate_kernel_tpu.py --w-back 24 --proj-rows -1 \
  > tools/results/val_wback24.log 2>&1
BENCH_WBACK=24 python bench.py > tools/results/bench_cold_wback24.log 2>&1
echo DONE_R3E
