#!/bin/bash
# Round-5 experiment C: bend conv-gap diagnosis. Full-defaults validation
# left scenario_three_bend marginally outside the f64-anchor band
# (gap_truth 0.0303 vs 0.03) while the per-row truth-agreement metric
# favors the kernel decisively (0.905 vs the XLA comparator's 0.695).
# Separate the two round-5 changes:
#   a. legacy squared-distance scoring (--no-proj-dot) at shipped w_back
#      -> isolates the Jacobian-quirk fix alone;
#   b. r4 configuration (w_back 64, --no-proj-dot)
#      -> directly comparable to val_r4_anchored.log (gap was 0.017);
#   c. proj_dot at w_back 64
#      -> isolates centering vs w_back interaction.
cd "$(dirname "$0")/.."
set -x
R=/root/repo/tools/results
python tools/validate_kernel_tpu.py --scenario scenario_three_bend \
  --no-proj-dot > $R/val_r5c_bend_nodot.log 2>&1
python tools/validate_kernel_tpu.py --scenario scenario_three_bend \
  --no-proj-dot --w-back 64 > $R/val_r5c_bend_nodot_wb64.log 2>&1
python tools/validate_kernel_tpu.py --scenario scenario_three_bend \
  --proj-dot --w-back 64 > $R/val_r5c_bend_dot_wb64.log 2>&1
echo DONE_R5C
