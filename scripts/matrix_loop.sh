#!/bin/bash
# Restart-loop wrapper for run_matrix.py.
#
# The runner exits 17 when the tunneled TPU backend crashes (a fresh
# process must reconnect); a WEDGED backend instead makes the runner HANG
# (round 3 lost ~2h to a crash loop and the rest of the evening to a hang:
# device materialization never returns, no exception). So each invocation
# runs under `timeout` (default 2h — the slowest healthy cell was 55 min),
# and between relaunches we wait until the backend answers a real matmul
# (scripts/probe_rows.py --health). Cells that START 3 times without ever
# finishing get a .crashed marker inside run_matrix.py and are skipped.
set -u
cd "$(dirname "$0")/.."
MATRIX_TIMEOUT="${MATRIX_TIMEOUT:-7200}"
for i in $(seq 1 40); do
  timeout "$MATRIX_TIMEOUT" python scripts/run_matrix.py "$@"
  rc=$?
  if [ "$rc" -eq 0 ]; then
    echo "[matrix_loop] runner finished cleanly"
    exit 0
  fi
  if [ "$rc" -eq 124 ]; then
    echo "[matrix_loop] runner TIMED OUT after ${MATRIX_TIMEOUT}s (attempt $i) — backend hang or runaway cell"
  else
    echo "[matrix_loop] runner exited rc=$rc (attempt $i)"
  fi
  # don't relaunch into a wedged backend: every start would burn a cell
  # attempt and hang for MATRIX_TIMEOUT again
  for h in $(seq 1 30); do
    if python scripts/probe_rows.py --health; then
      break
    fi
    echo "[matrix_loop] backend unhealthy; waiting 120s ($h/30)"
    sleep 120
  done
  sleep 30
done
echo "[matrix_loop] giving up after 40 restarts"
exit 1
