#!/bin/bash
# Round-4 post-run TPU queue (BENCHMARKS.md items 2-5), to execute AFTER
# benchmarks/run_full20k.sh completes. One TPU process at a time; each
# stage appends to its own log under /tmp.
#
# Usage: bash benchmarks/run_r4_queue.sh [exp_name]   (default r4full)
set -x
cd "$(dirname "$0")/.."

EXP=${1:-r4full}
CKDIR=exp/ngp_fox/${EXP}/checkpoints

# --- item 2: multi-state bench (steady-state throughput at 5k/10k/20k)
for IT in 00005000 00010000 00020000; do
  if [ -d "${CKDIR}/${IT}" ]; then
    F2_BENCH_CKPT="${CKDIR}/${IT}" timeout 3600 python bench.py \
      2>>/tmp/r4_queue_bench.log | tee -a /tmp/r4_queue_bench.log
  fi
done

# --- item 3: post-milestone step budget (validates compactA/cached-B wins)
if [ -d "${CKDIR}/00020000" ]; then
  F2_CKPT="${CKDIR}/00020000" timeout 3600 \
    python benchmarks/probe_step_budget.py 2>&1 | tee /tmp/r4_queue_budget.log
fi

# --- item 4: field A/B at equal budget (HashBlock vs Hash3DAnchored)
timeout 7200 bash benchmarks/run_ab_field.sh 2>&1 | tee /tmp/r4_queue_ab.log

# --- item 5: timed render_path sample (10 frames) from the trained state
timeout 7200 python scripts/run.py --config-name=wanjinyou \
  dataset_name=example case_name=ngp_fox mode=render_path is_continue=true \
  +render_path_frames=10 +work_dir="$(pwd)" exp_name="${EXP}" \
  2>&1 | tee /tmp/r4_queue_rpath.log
