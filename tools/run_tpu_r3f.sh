#!/bin/bash
# Round-3 experiment F: orbax-checkpointed sweep on chip with a real
# resume-after-kill (VERDICT round-2 item 5): run the kernel-engine sweep,
# kill the exact PID mid-run after a few committed steps, rerun with the
# same checkpoint dir, and show it resumes from the cursor and completes.
cd "$(dirname "$0")/.."
LOG=tools/results/sweep_resume_r3.log
CKPT=/tmp/sweep_ckpt_r3
rm -rf "$CKPT"
echo "=== phase 1: sweep started $(date -u +%H:%M:%S), will be killed after step 3 commits ===" > "$LOG"
python -m ilqr_tpu.apps.sweep -c configs/scenario_two_straight.yaml \
  --batch 2048 --steps 8 --engine kernel --checkpoint-dir "$CKPT" \
  >> "$LOG" 2>&1 &
PID=$!
for i in $(seq 1 240); do
  sleep 5
  if grep -q "step 3:" "$LOG"; then break; fi
  if ! kill -0 "$PID" 2>/dev/null; then break; fi
done
kill "$PID" 2>/dev/null
wait "$PID" 2>/dev/null
echo "=== killed sweep pid $PID at $(date -u +%H:%M:%S); rerunning with the same --checkpoint-dir ===" >> "$LOG"
python -m ilqr_tpu.apps.sweep -c configs/scenario_two_straight.yaml \
  --batch 2048 --steps 8 --engine kernel --checkpoint-dir "$CKPT" \
  >> "$LOG" 2>&1
echo DONE_R3F
