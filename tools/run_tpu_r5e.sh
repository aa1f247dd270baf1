#!/bin/bash
# Round-5 experiment E: HEAD-defaults confirmation + invariant rechecks
# after the round's kernel changes (Jacobian quirk, proj_dot centering,
# target-velocity projection bound as default).
#  1. bench at HEAD defaults (BENCH_PROJ=-1 -> derive_proj_rows @1.1)
#     -- must reproduce ~137.0k MPC / ~51.8k cold;
#  2. ls_chunk=4 on-chip bitwise invariant (kernel internals changed);
#  3. xla_canary (known miscompile-family check on the current stack).
cd "$(dirname "$0")/.."
set -x
R=/root/repo/tools/results
python bench.py > $R/bench_mpc_r5_head.log 2>&1
BENCH_MODE=cold python bench.py > $R/bench_cold_r5_head.log 2>&1
python tools/check_ls_chunk_tpu.py --chunk 4 > $R/check_ls_chunk4_r5.log 2>&1
python tools/xla_canary.py > $R/xla_canary_r5.log 2>&1
echo DONE_R5E
