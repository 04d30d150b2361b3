#!/bin/bash
# Round-4 TPU work queue (VERDICT r3 "Next round" items, priority order).
# Runs phases sequentially on the single tunneled chip; every phase is
# resume-safe (done cells are skipped), so this script can be killed and
# relaunched at any time. Logs to results/r4_queue.log via the caller.
set -u
cd "$(dirname "$0")/.."

echo "[r4] waiting for a healthy backend"
for h in $(seq 1 60); do
  if python scripts/probe_rows.py --health; then break; fi
  echo "[r4] backend unhealthy; waiting 180s ($h/60)"
  sleep 180
done

echo "[r4] phase 1: bisect slim_humanoid pets_cadm row-fault boundary"
timeout 10800 python scripts/probe_rows.py --probe slim_humanoid:pets_cadm --steps 6

echo "[r4] phase 2: cripple_ant pets_cadm s0 with the blowup guard"
# archive the round-3 collapsed cell ONCE (the archive dir is the marker,
# so a queue relaunch never archives the fresh guarded re-run)
if [ -f results/raw/cripple_ant__pets_cadm__s0.json ] && \
   [ ! -f results/raw_r3_collapsed/cripple_ant__pets_cadm__s0.json ]; then
  mkdir -p results/raw_r3_collapsed
  mv results/raw/cripple_ant__pets_cadm__s0.json results/raw_r3_collapsed/
  echo "[r4] archived the round-3 collapsed cell"
fi
bash scripts/matrix_loop.sh --families cripple_ant --models pets_cadm --seeds 0

echo "[r4] phase 3: hopper core cells (MBBL protocol)"
bash scripts/matrix_loop.sh --families hopper --models vanilla cadm pets_cadm --seeds 0 1

echo "[r4] phase 4: slim_humanoid pets_cadm s0 (probed budget)"
bash scripts/matrix_loop.sh --families slim_humanoid --models pets_cadm --seeds 0

echo "[r4] phase 5: baseline rows (paper Fig.3-5 comparisons)"
bash scripts/matrix_loop.sh --families half_cheetah cripple_ant --models stacked rebal grbal pets --seeds 0

echo "[r4] phase 6: PPO vs PPO+CaDM"
bash scripts/matrix_loop.sh --families hopper half_cheetah --models ppo ppo_cadm --seeds 0 1

echo "[r4] phase 7: seed-1 rigid cells"
bash scripts/matrix_loop.sh --families half_cheetah cripple_ant slim_humanoid --models vanilla cadm pets_cadm --seeds 1

echo "[r4] phase 8: plain-Ant family"
bash scripts/matrix_loop.sh --families ant --models vanilla cadm pets_cadm --seeds 0

echo "[r4] phase 9: context probing on trained snapshots"
for cell in cripple_ant__cadm__s0 cripple_ant__pets_cadm__s0 half_cheetah__cadm__s0; do
  if [ -f "results/ckpt/${cell}.pkl" ]; then
    timeout 3600 python scripts/probe_context.py --cell "$cell" || true
  fi
done

echo "[r4] queue complete"
