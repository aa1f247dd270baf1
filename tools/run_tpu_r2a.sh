#!/bin/bash
# Round-2 TPU batch A: prove groups=8 on hardware (VERDICT item 2).
# Sequential; each step gets its own log under tools/results/.
set -x
cd /root/repo
R=tools/results
mkdir -p "$R"

# 1. Full-size validation of the G=8 kernel on all four scenarios
timeout 5400 python tools/validate_kernel_tpu.py --groups 8 --proj-rows -1 \
    > "$R/val_g8.log" 2>&1
echo "val_g8 exit=$?"

# 2. Bench G=8 at the round-1 best cap, then cap retunes (tile = 1024 rows)
timeout 2400 env BENCH_GROUPS=8 BENCH_CAP=24 python bench.py \
    > "$R/bench_g8_cap24.log" 2>&1
echo "g8_cap24 exit=$?"
timeout 2400 env BENCH_GROUPS=8 BENCH_CAP=12,24 python bench.py \
    > "$R/bench_g8_cap12_24.log" 2>&1
echo "g8_cap12_24 exit=$?"
timeout 2400 env BENCH_GROUPS=8 BENCH_CAP=8,16,32 python bench.py \
    > "$R/bench_g8_cap8_16_32.log" 2>&1
echo "g8_cap8_16_32 exit=$?"

# 3. G=1 baseline under the same (edge-padded) code for a fair comparison
timeout 2400 env BENCH_GROUPS=1 BENCH_CAP=24 python bench.py \
    > "$R/bench_g1_cap24.log" 2>&1
echo "g1_cap24 exit=$?"
