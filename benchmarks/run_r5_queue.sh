#!/bin/bash
# Round-5 post-run TPU queue, to execute AFTER the full-budget r5full run
# completes. One TPU process at a time; each stage appends to its own log
# under /tmp. Ordered by VERDICT r4 priority: quality table first (SSIM via
# the new in-process test_images), then throughput evidence, then the two
# A/Bs, then the render_path deliverable.
#
# Usage: bash benchmarks/run_r5_queue.sh [exp_name]   (default r5full)
set -x
cd "$(dirname "$0")/.."

EXP=${1:-r5full}
CKDIR=exp/ngp_fox/${EXP}/checkpoints
LATEST=$(readlink -f "${CKDIR}/latest" 2>/dev/null || true)
[ -d "${LATEST}" ] || LATEST=""

# --- item 1: the quality table — mode=test at the final checkpoint with
# the SSIM-enabled test_images (writes test_images/info.{yaml,json})
if [ -n "${LATEST}" ]; then
  timeout 3600 python scripts/run.py --config-name=wanjinyou \
    dataset_name=example case_name=ngp_fox mode=test is_continue=true \
    +work_dir="$(pwd)" exp_name="${EXP}" 2>&1 | tee /tmp/r5_queue_test.log
fi

# --- item 2: multi-state bench (steady-state throughput at 5k/10k/latest)
for IT in 00005000 00010000; do
  if [ -d "${CKDIR}/${IT}" ] \
     && [ "$(readlink -f "${CKDIR}/${IT}")" != "${LATEST}" ]; then
    F2_BENCH_CKPT="${CKDIR}/${IT}" timeout 2400 python bench.py \
      2>>/tmp/r5_queue_bench.log | tee -a /tmp/r5_queue_bench.log
  fi
done
if [ -n "${LATEST}" ]; then
  F2_BENCH_CKPT="${LATEST}" timeout 2400 python bench.py \
    2>>/tmp/r5_queue_bench.log | tee -a /tmp/r5_queue_bench.log
fi

# --- item 3: post-milestone step budget at the final tree state
if [ -n "${LATEST}" ]; then
  F2_CKPT="${LATEST}" timeout 2400 \
    python benchmarks/probe_step_budget.py 2>&1 | tee /tmp/r5_queue_budget.log
fi

# --- item 4: field A/B to completion (r4's Hash3DAnchored arm died at
# iter 500/1200; give each arm its own generous timeout)
F2_AB_ITERS=${F2_AB_ITERS:-1200} timeout 14400 \
  bash benchmarks/run_ab_field.sh 2>&1 | tee /tmp/r5_queue_ab_field.log

# --- item 5: marcher A/B (parallel vs lockstep quality at equal budget)
F2_AB_ITERS=${F2_AB_MARCH_ITERS:-2000} timeout 14400 \
  bash benchmarks/run_ab_marcher.sh 2>&1 | tee /tmp/r5_queue_ab_march.log

# --- item 6: render_path (timed 10-frame sample, then the full 200 if the
# per-frame cost allows: F2_RP_ALL=1)
timeout 2400 python scripts/run.py --config-name=wanjinyou \
  dataset_name=example case_name=ngp_fox mode=render_path is_continue=true \
  +render_path_frames=10 +work_dir="$(pwd)" exp_name="${EXP}" \
  2>&1 | tee /tmp/r5_queue_rpath.log
if [ "${F2_RP_ALL:-0}" = "1" ]; then
  timeout 14400 python scripts/run.py --config-name=wanjinyou \
    dataset_name=example case_name=ngp_fox mode=render_path is_continue=true \
    +work_dir="$(pwd)" exp_name="${EXP}" 2>&1 | tee -a /tmp/r5_queue_rpath.log
  python scripts/imgs2mp4.py --data_dir "exp/ngp_fox/${EXP}/novel_images" \
    || true
fi
