#!/bin/bash
# Restart-loop wrapper for run_matrix.py: the runner exits with code 17 when
# the tunneled TPU backend crashes (a fresh process must reconnect); this
# loop relaunches it (resume-safe — finished cells are skipped) up to a cap.
set -u
cd "$(dirname "$0")/.."
for i in $(seq 1 40); do
  python scripts/run_matrix.py "$@"
  rc=$?
  if [ "$rc" -eq 0 ]; then
    echo "[matrix_loop] runner finished cleanly"
    exit 0
  fi
  echo "[matrix_loop] runner exited rc=$rc (attempt $i); backing off 30s"
  sleep 30
done
echo "[matrix_loop] giving up after 40 restarts"
exit 1
