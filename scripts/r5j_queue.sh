#!/bin/bash
# Round-5 phase J — second seeds for the detached-var-head (dv) neutrality
# claim, so every dv row cited in README/ROUND5.md is n=2 like the core rows:
#   1. cripple_ant pets_cadm_dv s1 (s0: 5547/2094/1835 — neutral-or-better)
#   2. hopper      pets_cadm_dv s1 (s0: 1515/1505/1475 — neutral)
#   3. slim_humanoid pets_cadm_dv s1 (pairs with the r5i s0 cell)
set -u
cd "$(dirname "$0")/.."
for cell in "cripple_ant 1" "hopper 1" "slim_humanoid 1"; do
  set -- $cell
  echo "[r5j] $1 pets_cadm_dv s$2"
  bash scripts/matrix_loop.sh --families "$1" --models pets_cadm_dv --seeds "$2"
done
echo "[r5j] complete"
