#!/bin/bash
# Round-5 phase B queue — VERDICT r4 items #4 (seed-1 sweep) and #3/#7
# (second-seed baselines + PPO rows).
#
# Priority order: the cells that de-risk the round's headline claims come
# first, so a mid-queue outage still leaves the most load-bearing second
# seeds recorded:
#   A1  cripple_ant pets_cadm s1      — replicate the decoupled-loss fix
#   A2  half_cheetah vanilla/cadm/pets_cadm s1 — the paper's flagship family
#   A3  cripple_ant vanilla/cadm s1
#   A4  slim_humanoid + hopper core s1
#   B   cheetah baselines s1 (stacked/rebal/grbal/pets) + PPO s1 rows
#   C   ant family s1
# Each matrix_loop call is resume-safe (done cells skip), so re-running
# this script after an interruption is harmless.
set -u
cd "$(dirname "$0")/.."

echo "[r5b] A1: cripple_ant pets_cadm s1"
bash scripts/matrix_loop.sh --families cripple_ant --models pets_cadm --seeds 1
echo "[r5b] A2: half_cheetah core s1"
bash scripts/matrix_loop.sh --families half_cheetah --models vanilla cadm pets_cadm --seeds 1
echo "[r5b] A3: cripple_ant vanilla/cadm s1"
bash scripts/matrix_loop.sh --families cripple_ant --models vanilla cadm --seeds 1
echo "[r5b] A4: slim_humanoid + hopper core s1"
bash scripts/matrix_loop.sh --families slim_humanoid hopper --models vanilla cadm pets_cadm --seeds 1
echo "[r5b] B: cheetah baselines s1 + PPO s1 rows"
bash scripts/matrix_loop.sh --families half_cheetah --models stacked rebal grbal pets --seeds 1
bash scripts/matrix_loop.sh --families half_cheetah hopper --models ppo ppo_cadm --seeds 1
echo "[r5b] C: ant family s1"
bash scripts/matrix_loop.sh --families ant --models vanilla cadm pets_cadm --seeds 1
echo "[r5b] queue complete"
