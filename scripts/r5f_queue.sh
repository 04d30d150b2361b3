#!/bin/bash
# Round-5 phase F — complete the fixed-protocol story:
#   1. cheetah pets_dv s0/s1      — the no-context PE-TS baseline under the
#      detached-variance protocol: the fair control for pets_cadm_dv
#      (the stock pets rows carry the same mid-run degradation the dv head
#      fixes, so CaDM-vs-baseline under ONE protocol needs this cell)
#   2. cripple_ant pets_cadm_aug s0 — ensemble + leg-symmetry augmentation
#      (does the aug transfer from the deterministic to the PE-TS variant?)
set -u
cd "$(dirname "$0")/.."
echo "[r5f] 1: cheetah pets_dv s0+s1"
bash scripts/matrix_loop.sh --families half_cheetah --models pets_dv --seeds 0
bash scripts/matrix_loop.sh --families half_cheetah --models pets_dv --seeds 1
echo "[r5f] 2: cripple_ant pets_cadm_aug s0"
bash scripts/matrix_loop.sh --families cripple_ant --models pets_cadm_aug --seeds 0
echo "[r5f] complete"
