#!/bin/bash
# Round-5 experiment G:
#  1. bend validation dump + per-row agreement cross-tab (the row-level
#     evidence for the two-arm conv gate, docs/PARITY.md 4b);
#  2. fresh marginal-cost probe attribution at the round-5 defaults
#     (target-velocity bound changed the component shares; probes need
#     the serial-LS baseline, ILQR_LS_CHUNK=0).
cd "$(dirname "$0")/.."
set -x
R=/root/repo/tools/results
python tools/validate_kernel_tpu.py --scenario scenario_three_bend \
  --dump /tmp/dump_r5 > $R/val_r5_bend_dump.log 2>&1
python tools/agree_crosstab.py /tmp/dump_r5/val_scenario_three_bend.npz \
  > $R/agree_crosstab_bend_r5.log 2>&1
ILQR_LS_CHUNK=0 BENCH_MODE=cold python bench.py > $R/probe_r5_base.log 2>&1
for p in 2proj 2fwd 2cost; do
  CILQR_KERNEL_PROBE=$p ILQR_LS_CHUNK=0 BENCH_MODE=cold python bench.py \
    > $R/probe_r5_$p.log 2>&1
done
echo DONE_R5G
