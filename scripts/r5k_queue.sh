#!/bin/bash
# Round-5 phase K — finish the detached-var-head (dv) neutrality story after
# the probed-budget fallback fix (82e28ac): slim_humanoid dv cells now run
# under the 66560-row single-block budget instead of the faulting 32768
# chunked path that crashed r5i item 2 twice.
#   1. slim_humanoid pets_cadm_dv s0 (the r5i cell, re-run under the fix)
#   2. cripple_ant  pets_cadm_dv s1 (pairs with s0: 5547/2094/1835)
#   3. hopper       pets_cadm_dv s1 (pairs with s0: 1515/1505/1475)
#   4. slim_humanoid pets_cadm_dv s1
set -u
cd "$(dirname "$0")/.."
for cell in "slim_humanoid 0" "cripple_ant 1" "hopper 1" "slim_humanoid 1"; do
  set -- $cell
  echo "[r5k] $1 pets_cadm_dv s$2"
  bash scripts/matrix_loop.sh --families "$1" --models pets_cadm_dv --seeds "$2"
done
echo "[r5k] complete"
