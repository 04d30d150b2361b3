#!/bin/bash
# Round-5 phase I — replicate the round's headline cell and finish the
# detached-var-head neutrality story:
#   1. cripple_ant pets_cadm_aug s1 — the aug+dv ensemble (3594/5883/6322
#      at s0, the best shifted-range cell in the matrix) at n=2.
#   2. slim_humanoid pets_cadm_dv s0 — dv head on the fourth rigid family
#      (claimed neutral-or-better on cheetah/cripple_ant/hopper so far).
set -u
cd "$(dirname "$0")/.."
echo "[r5i] 1: cripple_ant pets_cadm_aug s1"
bash scripts/matrix_loop.sh --families cripple_ant --models pets_cadm_aug --seeds 1
echo "[r5i] 2: slim_humanoid pets_cadm_dv s0"
bash scripts/matrix_loop.sh --families slim_humanoid --models pets_cadm_dv --seeds 0
echo "[r5i] complete"
