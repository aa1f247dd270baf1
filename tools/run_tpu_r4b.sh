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
# 2a (already run separately): proj_dot cold bench measured 43,193
# solves/s, +5.9% over the 40,794 ls4 baseline ($R/bench_cold_projdot.log)
# 2b: proj_dot four-scenario statistical validation
python tools/validate_kernel_tpu.py --batch 1024 --proj-dot \
  > $R/val_r4_projdot.log 2>&1
echo DONE_R4B
