#!/bin/bash
# Round-4 experiment B: (1) committed four-scenario validation under the
# shipped defaults with the f64-anchor convergence gate (VERDICT r3 #1),
# (2) the dot-form projection candidate: cold-bench measurement + full
# statistical validation (NOTES r3 candidate 4, unblocked by the fresh
# probe data: trial projections are still the top term at 29%).
cd "$(dirname "$0")/.."
set -x
R=/root/repo/tools/results
# 1: four-scenario validation, round-3 defaults, anchor-gated
python tools/validate_kernel_tpu.py --batch 1024 \
  > $R/val_r4_anchored.log 2>&1
# 2a: proj_dot cold bench (vs 40,794 at ls4+caps, bench_cold_ls4.log)
ILQR_PROJ_DOT=1 BENCH_MODE=cold python bench.py \
  > $R/bench_cold_projdot.log 2>&1
# 2b: proj_dot four-scenario statistical validation
python tools/validate_kernel_tpu.py --batch 1024 --proj-dot \
  > $R/val_r4_projdot.log 2>&1
echo DONE_R4B
