#!/bin/bash
# Round-5 experiment A, after the Jacobian-quirk parity fix
# (beta_jac = atan(tan(stl/2)), src/utils.cpp:292) and the proj_dot
# coordinate-centering fix (round-4 advisor medium):
#  1. full-size four-scenario validation under SHIPPED defaults
#     (proj_dot env resolution -> ON, w_back 24, caps 8,16,32) with the
#     new full-batch per-row f64-agreement gate (VERDICT r4 item #2);
#  2. fresh bench numbers (MPC episodes + cold) for the headline
#     reconciliation;
#  3. pscan decision probe: small-batch long horizons, the only regime
#     where parallel-in-time could plausibly win (VERDICT r4 item #5).
# Run from a pinned worktree; serialize — the relay queues compiles.
cd "$(dirname "$0")/.."
set -x
R=/root/repo/tools/results
python tools/validate_kernel_tpu.py > $R/val_r5_quirk_centered.log 2>&1
python bench.py > $R/bench_mpc_r5_quirk.log 2>&1
BENCH_MODE=cold python bench.py > $R/bench_cold_r5_quirk.log 2>&1
python tools/bench_long_horizon.py --batch 1 --horizons 512,2048 \
  > $R/bench_long_horizon_b1.log 2>&1
python tools/bench_long_horizon.py --batch 8 --horizons 512,2048 \
  > $R/bench_long_horizon_b8.log 2>&1
echo DONE_R5A
