#!/bin/bash
# Round-4b TPU queue (continuation session after the TPU outage).
# Tightened priority order vs r4_tpu_queue.sh: seed-0 coverage of every
# missing VERDICT row first, seed-1 replication last, so an early cutoff
# still leaves a complete 1-seed story. Every phase is resume-safe.
set -u
cd "$(dirname "$0")/.."

# Phase A: the pets_cadm fix validation cell. The round-4a guarded re-run
# still collapsed (39.6/41.8/57.7 — blowup-guard hypothesis dead); this
# re-run carries the NLL mean-anchor fix (DynamicsConfig.mean_anchor).
# Archive the collapsed 4a cell once (marker = archive dir entry).
if [ -f results/raw/cripple_ant__pets_cadm__s0.json ] && \
   [ ! -f results/raw_r4a_collapsed/cripple_ant__pets_cadm__s0.json ]; then
  mkdir -p results/raw_r4a_collapsed
  mv results/raw/cripple_ant__pets_cadm__s0.json results/raw_r4a_collapsed/
  rm -f results/raw/cripple_ant__pets_cadm__s0.attempts
  echo "[r4b] archived the 4a collapsed cripple_ant pets_cadm cell"
fi
bash scripts/matrix_loop.sh --families cripple_ant --models pets_cadm --seeds 0

echo "[r4b] phase B: hopper pets_cadm + slim_humanoid pets_cadm (s0)"
bash scripts/matrix_loop.sh --families hopper --models pets_cadm --seeds 0
bash scripts/matrix_loop.sh --families slim_humanoid --models pets_cadm --seeds 0

echo "[r4b] phase C: baseline rows on half_cheetah (paper Fig.3-5)"
bash scripts/matrix_loop.sh --families half_cheetah --models stacked rebal grbal pets --seeds 0

echo "[r4b] phase D: PPO vs PPO+CaDM (hopper + half_cheetah, s0)"
bash scripts/matrix_loop.sh --families hopper half_cheetah --models ppo ppo_cadm --seeds 0

echo "[r4b] phase E: context probing on matrix-scale snapshots"
for cell in cripple_ant__pets_cadm__s0 cripple_ant__cadm__s0 hopper__cadm__s0; do
  if [ -f "results/ckpt/${cell}.pkl" ]; then
    timeout 3600 python scripts/probe_context.py --cell "$cell" || true
  fi
done

echo "[r4b] phase F: cripple_ant baselines + plain-Ant family (s0)"
bash scripts/matrix_loop.sh --families cripple_ant --models stacked rebal grbal pets --seeds 0
bash scripts/matrix_loop.sh --families ant --models vanilla cadm pets_cadm --seeds 0

echo "[r4b] phase G: seed-1 replication (rigid families)"
bash scripts/matrix_loop.sh --families hopper half_cheetah cripple_ant slim_humanoid --models vanilla cadm pets_cadm --seeds 1
bash scripts/matrix_loop.sh --families hopper half_cheetah --models ppo ppo_cadm --seeds 1

echo "[r4b] queue complete"
