#!/bin/bash
# Round-3 experiment C: long orbax-checkpointed sweep on chip with a
# mid-sweep kill + resume (VERDICT round-2 item 5). The sweep app runs the
# fused-kernel engine (default off-CPU) with the multi-phase straggler
# schedule; part 1 is killed by PID mid-sweep, part 2 resumes from the
# orbax cursor.
cd "$(dirname "$0")/.."
set -x
rm -rf /tmp/sweep_ckpt_r3
python -m ilqr_tpu.apps.sweep -c configs/scenario_two_straight.yaml \
  --batch 8192 --steps 400 --checkpoint-dir /tmp/sweep_ckpt_r3 \
  > tools/results/sweep_r3_part1.log 2>&1 &
PID=$!
# wait for mid-sweep (step 150 logged), then kill that exact PID
for i in $(seq 1 400); do
  if ! kill -0 $PID 2>/dev/null; then break; fi
  if grep -q "step 150" tools/results/sweep_r3_part1.log; then break; fi
  sleep 5
done
kill $PID 2>/dev/null || true
wait $PID 2>/dev/null
sleep 2
python -m ilqr_tpu.apps.sweep -c configs/scenario_two_straight.yaml \
  --batch 8192 --steps 400 --checkpoint-dir /tmp/sweep_ckpt_r3 \
  > tools/results/sweep_r3_part2.log 2>&1
echo DONE_R3C
