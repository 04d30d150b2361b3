#!/bin/bash
# Round-5 phase H — second seeds for the cripple_ant baseline rows, so the
# second family's CaDM-vs-baselines story (VERDICT r4 missing #7 asked for
# >=2 families) is n=2 like the cheetah one:
#   cripple_ant stacked/rebal/grbal/pets, seed 1
# (rebal s0 was an outlier — 4411 train but 366/375 shifted; s1 decides
#  whether that is the model or the seed.)
set -u
cd "$(dirname "$0")/.."
for m in stacked rebal grbal pets; do
  echo "[r5h] cripple_ant $m s1"
  bash scripts/matrix_loop.sh --families cripple_ant --models "$m" --seeds 1
done
echo "[r5h] complete"
