#!/bin/bash
# Round-4 post-run TPU queue (BENCHMARKS.md items 2-5), to execute AFTER
# the full-budget run completes. One TPU process at a time; each stage
# appends to its own log under /tmp. Ordered cheapest-first so a deadline
# truncates the least-important tail (the field A/B re-runs training and
# is the most expendable).
#
# Usage: bash benchmarks/run_r4_queue.sh [exp_name]   (default r4fix)
set -x
cd "$(dirname "$0")/.."

EXP=${1:-r4fix}
CKDIR=exp/ngp_fox/${EXP}/checkpoints
LATEST=$(readlink -f "${CKDIR}/latest" 2>/dev/null || true)
# readlink -f succeeds when only the final component is missing: with a
# checkpoints dir but no 'latest' symlink, LATEST would be a non-empty
# dangling path and bench.py would silently fall back to a different
# experiment's checkpoint — require an existing directory
[ -d "${LATEST}" ] || LATEST=""

# --- item 2: multi-state bench (steady-state throughput at 5k/10k/latest)
for IT in 00005000 00010000; do
  if [ -d "${CKDIR}/${IT}" ] \
     && [ "$(readlink -f "${CKDIR}/${IT}")" != "${LATEST}" ]; then
    F2_BENCH_CKPT="${CKDIR}/${IT}" timeout 2400 python bench.py \
      2>>/tmp/r4_queue_bench.log | tee -a /tmp/r4_queue_bench.log
  fi
done
if [ -n "${LATEST}" ]; then
  F2_BENCH_CKPT="${LATEST}" timeout 2400 python bench.py \
    2>>/tmp/r4_queue_bench.log | tee -a /tmp/r4_queue_bench.log
fi

# --- item 3: post-milestone step budget (validates compactA/cached-B wins)
if [ -n "${LATEST}" ]; then
  F2_CKPT="${LATEST}" timeout 2400 \
    python benchmarks/probe_step_budget.py 2>&1 | tee /tmp/r4_queue_budget.log
fi

# --- item 5 (moved up: cheap): timed render_path sample (10 frames)
timeout 2400 python scripts/run.py --config-name=wanjinyou \
  dataset_name=example case_name=ngp_fox mode=render_path is_continue=true \
  +render_path_frames=10 +work_dir="$(pwd)" exp_name="${EXP}" \
  2>&1 | tee /tmp/r4_queue_rpath.log

# --- item 4: field A/B at equal budget (HashBlock vs Hash3DAnchored)
F2_AB_ITERS=${F2_AB_ITERS:-1200} timeout 5400 \
  bash benchmarks/run_ab_field.sh 2>&1 | tee /tmp/r4_queue_ab.log
