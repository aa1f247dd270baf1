#!/bin/bash
# Round-4 experiment A: (C) fresh kernel time-attribution probes under
# today's defaults (serial-LS baseline -- the probes instrument the serial
# line-search body, so the comparison baseline is ILQR_LS_CHUNK=0),
# (E) on-chip bitwise check of the SHIPPED ls_chunk=4 width (round-3
# advisor: the committed check only covered width 8), (D) the
# sweep-vs-bench throughput-gap study (VERDICT r3 #6).
cd "$(dirname "$0")/.."
set -x
R=/root/repo/tools/results
# C: probe attribution (batch 8192, caps 8,16,32, serial LS)
ILQR_LS_CHUNK=0 BENCH_MODE=cold python bench.py > $R/probe_r4_base.log 2>&1
for p in 2proj 2fwd 2cost 2derivs; do
  CILQR_KERNEL_PROBE=$p ILQR_LS_CHUNK=0 BENCH_MODE=cold python bench.py \
    > $R/probe_r4_$p.log 2>&1
done
# E: ls_chunk=4 (the shipped default) bitwise check on hardware
python tools/check_ls_chunk_tpu.py --chunk 4 > $R/check_ls_chunk4.log 2>&1
# D: sweep throughput at 2048/4096/8192 + cold bench at 2048
for b in 2048 4096 8192; do
  python -m ilqr_tpu.apps.sweep -c configs/scenario_two_straight.yaml \
    --batch $b --steps 6 > $R/sweep_r4_b$b.log 2>&1
done
BENCH_MODE=cold BENCH_BATCH=2048 python bench.py > $R/bench_cold_b2048.log 2>&1
echo DONE_R4A
