#!/usr/bin/env bash
# Batch-launch a turn-budget sweep (equivalent of the reference's
# scripts/run_caesar.sh max_k sweep): one run per max_k value.
#
# Usage: scripts/run_sweep.sh <run_group> [dataset] [backend]
set -euo pipefail

RUN_GROUP="${1:?usage: run_sweep.sh <run_group> [dataset] [backend]}"
DATASET="${2:-kernelbench-tpu/level1-subset}"
BACKEND="${3:-mock}"

for MAX_K in 1 2 3 4 5 6 7 8 9 10; do
  python -m caesar_tpu.main \
    run_group="${RUN_GROUP}" \
    run_name="maxk_${MAX_K}" \
    dataset_name="${DATASET}" \
    backend="${BACKEND}" \
    eval_backend="mock" \
    max_k="${MAX_K}" \
    'prompt_strategy=["SHOW_INLINE_SYNTAX","COMPILER_FEEDBACK","CORRECTNESS_FEEDBACK","PROFILER_FEEDBACK"]'
done
