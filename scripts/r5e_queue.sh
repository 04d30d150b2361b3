#!/bin/bash
# Round-5 phase E — harden the detached-variance-head result and close the
# cripple_ant augmentation A/B:
#   1. cheetah pets_cadm_dv s1            — second seed for the fix
#   2. cripple_ant pets_cadm_dv s0        — dv on a family where the
#      shared-trunk decoupled loss was already healthy (4703/2534/2396):
#      if dv is neutral-or-better here too, it becomes the recommended
#      protocol for every probabilistic cell
#   3. hopper pets_cadm_dv s0             — same check, cheaper family
#   4. cripple_ant cadm_aug s1            — second seed for the
#      leg-symmetry augmentation (s0: extreme 3743 vs vanilla 2488)
set -u
cd "$(dirname "$0")/.."
echo "[r5e] 1: cheetah pets_cadm_dv s1"
bash scripts/matrix_loop.sh --families half_cheetah --models pets_cadm_dv --seeds 1
echo "[r5e] 2: cripple_ant pets_cadm_dv s0"
bash scripts/matrix_loop.sh --families cripple_ant --models pets_cadm_dv --seeds 0
echo "[r5e] 3: hopper pets_cadm_dv s0"
bash scripts/matrix_loop.sh --families hopper --models pets_cadm_dv --seeds 0
echo "[r5e] 4: cripple_ant cadm_aug s1"
bash scripts/matrix_loop.sh --families cripple_ant --models cadm_aug --seeds 1
echo "[r5e] complete"
