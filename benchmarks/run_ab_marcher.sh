#!/bin/bash
# A/B: parallel jittered-grid marcher (the TPU-native default) vs the
# reference-exact lockstep EMIT/ADVANCE marcher, at EQUAL budget on fox —
# same iters, same seed (2022), same schedule (VERDICT r4 #4). The parallel
# marcher evaluates the warp Jacobian once per hit interval at entry
# (sampler/device.py ray_march_parallel) instead of per step
# (PersSampler.cu:189-314); this measures what that approximation costs in
# test PSNR and what it buys in it/s. Run ALONE on the TPU; ~60-80 min.
set -ex
cd "$(dirname "$0")/.."

ITERS=${F2_AB_ITERS:-2000}
# compressed maintenance so the short budget still crosses subdivision
COMMON="dataset_name=example case_name=ngp_fox mode=train +work_dir=$(pwd)
  train.end_iter=${ITERS}
  pts_sampler.sub_div_milestones=[300,600,900,1200]"

for MODE in parallel lockstep; do
  EXP=ab_march_${MODE}
  timeout 10800 python scripts/run.py --config-name=wanjinyou ${COMMON} \
    exp_name="${EXP}" pts_sampler.march_mode=${MODE} 2>&1 | tee /tmp/${EXP}.log
  tail -3 "exp/ngp_fox/${EXP}/test_images/info.yaml" || true
done

echo "=== A/B summary ==="
for MODE in parallel lockstep; do
  echo "--- ${MODE}"
  grep mean_psnr "exp/ngp_fox/ab_march_${MODE}/test_images/info.yaml" || true
  grep "IPS" /tmp/ab_march_${MODE}.log | tail -3 || true
done
