#!/bin/bash
# Round-4 experiment E: generalization refresh under the proj_dot default:
# the other two episode scenarios + one tuned-sweep JSON snapshot.
cd "$(dirname "$0")/.."
set -x
R=/root/repo/tools/results
python tools/bench_mpc_chunked.py --scenario scenario_three_straight \
  --batch 8192 --reps 3 > $R/bench_chunked_three_projdot.log 2>&1
python tools/bench_mpc_chunked.py --scenario scenario_two_borrow \
  --batch 8192 --reps 3 > $R/bench_chunked_borrow_projdot.log 2>&1
python -m ilqr_tpu.apps.sweep -c configs/scenario_two_straight.yaml \
  --steps 6 > $R/sweep_r4_tuned.log 2>&1
echo DONE_R4E
