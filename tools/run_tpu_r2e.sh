#!/bin/bash
# Round-2 TPU batch E: finer straggler-schedule search around the 8,16,32
# winner, plus the MPC episode bench at the tuned schedule.
set -x
cd /root/repo
R=tools/results
mkdir -p "$R"

for cap in "4,8,16,32" "8,16,32,64" "6,12,24,48" "8,12,16,32"; do
  tag=$(echo "$cap" | tr ',' '_')
  timeout 2400 env BENCH_CAP="$cap" python bench.py \
      > "$R/bench_g1_cap${tag}.log" 2>&1
  echo "g1_cap${tag} exit=$?"
done

timeout 4800 env BENCH_MODE=mpc BENCH_CAP=8,16,32 python bench.py \
    > "$R/bench_mode_mpc_tuned.log" 2>&1
echo "mpc_tuned exit=$?"
