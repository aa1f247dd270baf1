#!/bin/bash
# Round-2 TPU batch F: corrected MPC episode numbers (unrolled program),
# cold per tick and with the reference's warm-start mode.
set -x
cd /root/repo
R=tools/results
mkdir -p "$R"

timeout 4800 env BENCH_MODE=mpc python bench.py \
    > "$R/bench_mode_mpc_unrolled.log" 2>&1
echo "mpc_unrolled exit=$?"
timeout 4800 env BENCH_MODE=mpc BENCH_WARM=1 python bench.py \
    > "$R/bench_mode_mpc_warm.log" 2>&1
echo "mpc_warm exit=$?"
