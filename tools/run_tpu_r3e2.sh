#!/bin/bash
# Round-3 experiment E2: locate the packed-line-search / compaction
# interaction. Under the 8,16,32 compaction schedule ls_chunk=8 measured
# ~4-5% BELOW serial (bench_cold_ls8.log, bench_mpc_ls8_warm.log): the
# multi-phase compaction already homogenizes tile trial counts, so the
# chunk's 8-projection cost outweighs the saved rollout chains. Probe:
# (1) chunk=4 (half the projection overshoot), (2) compaction OFF, where
# the tile-max divergence the packed form targets is at its worst.
cd "$(dirname "$0")/.."
set -x
ILQR_LS_CHUNK=4 python bench.py > tools/results/bench_cold_ls4.log 2>&1
BENCH_CAP=0 python bench.py > tools/results/bench_cold_cap0_serial.log 2>&1
BENCH_CAP=0 ILQR_LS_CHUNK=8 python bench.py \
  > tools/results/bench_cold_cap0_ls8.log 2>&1
echo DONE_R3E2
