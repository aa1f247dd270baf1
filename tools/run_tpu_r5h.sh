#!/bin/bash
# Round-5 experiment H: decide the slack default. Cold sweep was
# monotone (48: 52.5k, 32: 54.1k, 24: 54.3k, 16: 56.1k; conv/iters
# unchanged -- bench_cold_r5_slack*.log). Validate slack 16 on all four
# scenarios and measure the episode bench; ship on 4/4 PASS with
# unbounded-identical statistics, else fall back to the best passing
# value.
cd "$(dirname "$0")/.."
set -x
R=/root/repo/tools/results
ILQR_PROJ_SLACK=16 python tools/validate_kernel_tpu.py --proj-rows -1 \
  > $R/val_r5_slack16.log 2>&1
ILQR_PROJ_SLACK=16 python bench.py > $R/bench_mpc_r5_slack16.log 2>&1
echo DONE_R5H
