#!/usr/bin/env bash
# Chaos/kill-loop robustness harness (equivalent of the reference's
# run_shuffle_kill.sh + run_loop.sh, SURVEY.md §4.3): repeatedly launch a
# sweep, SIGKILL it after a deadline, and rely on journal/DONE recovery to
# converge.  Exits 0 when every trajectory has a DONE sentinel.
#
# Kills only the exact PID this script started — never by pattern.
#
# Usage: scripts/run_chaos.sh <run_group> <run_name> [kill_after_s] [max_rounds]
set -uo pipefail

RUN_GROUP="${1:?usage: run_chaos.sh <run_group> <run_name> [kill_after_s] [max_rounds]}"
RUN_NAME="${2:?}"
KILL_AFTER="${3:-20}"
MAX_ROUNDS="${4:-50}"
LOG_DIR="${LOG_DIR:-runs/logs}"
DATASET="${DATASET:-kernelbench-tpu/level1-subset}"

expected_done() {
  python - "$LOG_DIR/$RUN_GROUP/$RUN_NAME" <<'EOF'
import sys, glob, os
root = sys.argv[1]
print(len(glob.glob(os.path.join(root, "problem_*", "sample_*", "DONE"))))
EOF
}

for ROUND in $(seq 1 "${MAX_ROUNDS}"); do
  python -m caesar_tpu.main \
    run_group="${RUN_GROUP}" run_name="${RUN_NAME}" \
    dataset_name="${DATASET}" backend=mock eval_backend=mock max_k=3 \
    log_dir_prefix="${LOG_DIR}" \
    'prompt_strategy=["SHOW_INLINE_SYNTAX","COMPILER_FEEDBACK","CORRECTNESS_FEEDBACK","PROFILER_FEEDBACK"]' &
  PID=$!

  SECONDS=0
  STATUS=running
  while kill -0 "${PID}" 2>/dev/null; do
    if [ "${SECONDS}" -ge "${KILL_AFTER}" ]; then
      echo "[chaos] round ${ROUND}: killing ${PID} after ${SECONDS}s"
      kill -9 "${PID}" 2>/dev/null
      STATUS=killed
      break
    fi
    sleep 1
  done
  wait "${PID}" 2>/dev/null

  DONE=$(expected_done)
  echo "[chaos] round ${ROUND}: status=${STATUS}, DONE count=${DONE}"
  if [ "${STATUS}" = "running" ] || [ "${STATUS}" = "" ]; then :; fi
  if ! kill -0 "${PID}" 2>/dev/null && [ "${STATUS}" != "killed" ]; then
    echo "[chaos] sweep completed cleanly after ${ROUND} rounds (DONE=${DONE})"
    exit 0
  fi
done

echo "[chaos] did not converge within ${MAX_ROUNDS} rounds" >&2
exit 1
