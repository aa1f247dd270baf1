#!/bin/bash
# Round-5 experiment D: decide the tightened projection bound
# (VERDICT r4 item #3, continued from run_tpu_r5b.sh). Cold-bench gains:
# proj 15 +5.1%, proj 11 +11.8%, proj 9 +15.9% (bench_cold_r5_proj*.log)
# with bench conv/iters unchanged. Now the anchor validation decides:
#  1. four scenarios at factor 1.3 (the proj-11-class bound);
#  2. four scenarios at factor 1.1 (the proj-9-class bound);
#  3. MPC-episode benches at the new default and the aggressive bound.
# Also: full-defaults (no proj bound) revalidation to commit a PASS log
# under the round-5 two-arm conv gate.
cd "$(dirname "$0")/.."
set -x
R=/root/repo/tools/results
python tools/validate_kernel_tpu.py --proj-rows -1 --proj-factor 1.3 \
  > $R/val_r5_projtarget.log 2>&1
python tools/validate_kernel_tpu.py --proj-rows -1 --proj-factor 1.1 \
  > $R/val_r5_projtarget11.log 2>&1
python bench.py > $R/bench_mpc_r5_proj11.log 2>&1
BENCH_PROJ=9 python bench.py > $R/bench_mpc_r5_proj9.log 2>&1
python tools/validate_kernel_tpu.py > $R/val_r5_defaults_gate2.log 2>&1
echo DONE_R5D
