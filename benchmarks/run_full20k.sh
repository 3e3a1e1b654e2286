#!/bin/bash
# Full-budget fox run (VERDICT r2 #3): the reference training contract —
# 20k iters at pts_batch_size=262144 (ExpRunner.cpp:65-186,
# confs/train/20k.yaml:1-2) — through the product CLI, then the test-set
# render (mode runs it automatically after train) and the 200-pose
# render_path (BASELINE config 5, ExpRunner.cpp:322-341).
#
# Run ALONE on the TPU (one process, tunnel discipline). Logs tee'd so the
# economy trajectory (Samples/MeaningfulSamples/OctSamples per report line)
# is preserved for BENCHMARKS.md.
set -ex
cd "$(dirname "$0")/.."

EXP=${F2_EXP:-r3full}
LOG=/tmp/full20k_${EXP}.log

# save_freq=5000 (reference default saves only at 20000): mid-run
# checkpoints let bench.py measure throughput at multiple training states
# (iter 5k/10k/15k/20k) after the fact.
timeout 28800 python scripts/run.py --config-name=wanjinyou \
  dataset_name=example case_name=ngp_fox mode=train \
  train.save_freq=5000 \
  +work_dir="$(pwd)" exp_name="${EXP}" 2>&1 | tee "$LOG"

# 200-pose novel-view path from the trained checkpoint (BASELINE config 5).
# Opt-in (F2_RENDER_PATH=1): check the per-frame eval cost in the train
# log's TestImages section first — at N s/frame this step costs 200*N s of
# exclusive tunnel time. F2_RP_FRAMES caps the pose count for a timed
# sample before committing to all 200.
if [ "${F2_RENDER_PATH:-0}" = "1" ]; then
  FRAMES=${F2_RP_FRAMES:-0}   # 0 = all poses
  timeout 14400 python scripts/run.py --config-name=wanjinyou \
    dataset_name=example case_name=ngp_fox mode=render_path is_continue=true \
    +render_path_frames=${FRAMES} \
    +work_dir="$(pwd)" exp_name="${EXP}" 2>&1 | tee -a "$LOG"
fi
