#!/bin/bash
# Round-2 TPU batch B: groups=8 with the 100 MiB scoped-vmem budget
# (validation on all four scenarios + bench cap retunes), plus the
# long-horizon pscan bench (VERDICT items 2 and 7).
set -x
cd /root/repo
R=tools/results
mkdir -p "$R"

timeout 7200 python tools/validate_kernel_tpu.py --groups 8 --proj-rows -1 \
    > "$R/val_g8_b.log" 2>&1
echo "val_g8_b exit=$?"

timeout 2400 env BENCH_GROUPS=8 BENCH_CAP=24 python bench.py \
    > "$R/bench_g8_cap24.log" 2>&1
echo "g8_cap24 exit=$?"
timeout 2400 env BENCH_GROUPS=8 BENCH_CAP=12,24 python bench.py \
    > "$R/bench_g8_cap12_24.log" 2>&1
echo "g8_cap12_24 exit=$?"
timeout 2400 env BENCH_GROUPS=8 BENCH_CAP=8,16,32 python bench.py \
    > "$R/bench_g8_cap8_16_32.log" 2>&1
echo "g8_cap8_16_32 exit=$?"
timeout 2400 env BENCH_GROUPS=8 BENCH_CAP=0 python bench.py \
    > "$R/bench_g8_cap0.log" 2>&1
echo "g8_cap0 exit=$?"

timeout 5400 python tools/bench_long_horizon.py --batch 64 \
    --horizons 32,128,512 > "$R/bench_long_horizon.log" 2>&1
echo "long_horizon exit=$?"
