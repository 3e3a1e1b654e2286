#!/bin/bash
# A/B: HashBlock (TPU-native block-row field, the default) vs
# Hash3DAnchored (reference per-corner semantics, fields/hash_encoding.py)
# at EQUAL budget on fox — same iters, same seed (2022), same schedule
# (VERDICT r2 #6). Records test PSNR (test_images/info.yaml) and the
# steady it/s from the report lines. Run ALONE on the TPU; ~30 min total.
#
# Reference semantics under comparison: Hash3DAnchored.cu:44-79 (shared
# corner grid) vs hash_block.py (block rows, duplicated face corners).
set -ex
cd "$(dirname "$0")/.."

ITERS=${F2_AB_ITERS:-1500}
# compressed maintenance so the short budget still crosses subdivision
COMMON="dataset_name=example case_name=ngp_fox mode=train +work_dir=$(pwd)
  train.end_iter=${ITERS}
  pts_sampler.sub_div_milestones=[300,600,900,1200]"

for FIELD in HashBlock Hash3DAnchored; do
  EXP=ab_${FIELD}
  timeout 7200 python scripts/run.py --config-name=wanjinyou ${COMMON} \
    exp_name="${EXP}" field.type=${FIELD} 2>&1 | tee /tmp/${EXP}.log
  tail -3 "exp/ngp_fox/${EXP}/test_images/info.yaml" || true
done

echo "=== A/B summary ==="
for FIELD in HashBlock Hash3DAnchored; do
  echo "--- ${FIELD}"
  grep mean_psnr "exp/ngp_fox/ab_${FIELD}/test_images/info.yaml" || true
  grep "IPS" /tmp/ab_${FIELD}.log | tail -3 || true
done
