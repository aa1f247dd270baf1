#!/bin/bash
# Round-2 TPU batch D: straggler-schedule retune at groups=1 (the
# production path) for the cold-solve headline.
set -x
cd /root/repo
R=tools/results
mkdir -p "$R"

for cap in "12,24" "8,16,32" "16" "32"; do
  tag=$(echo "$cap" | tr ',' '_')
  timeout 2400 env BENCH_CAP="$cap" python bench.py \
      > "$R/bench_g1_cap${tag}.log" 2>&1
  echo "g1_cap${tag} exit=$?"
done
