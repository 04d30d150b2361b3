#!/bin/bash
# Round-5 TPU queue — VERDICT r4 priority order.
#
# Phase 1 (verdict #1): the decoupled stop-gradient loss at matrix scale.
#   The additive-anchor cripple_ant re-run collapsed (87/32/49, fwd MSE
#   pinned ~0.29); the shipped decoupled loss has hopper-scale evidence
#   (fwd MSE 0.07) but none on the collapsing family. Archive the
#   additive-era cell and the pre-anchor cheetah cell (recorded with
#   probabilistic=False — a deterministic-ensemble control, not PE-TS),
#   then re-run both under the tagged loss.
# Phase 2 (verdict #2): slim_humanoid pets_cadm crash — real-cell itr2
#   trials at the chunked (32768) vs single-block (66560) budget; if the
#   single block passes, the probe JSON records it, run_matrix now lets it
#   OVERRIDE the variant guess, and the cell re-runs after clearing
#   .crashed.
# Phase 3 (verdict #8): plain-Ant family s0.
# Later phases (seed-1 sweep etc.) are driven adaptively by the builder.
set -u
cd "$(dirname "$0")/.."

echo "[r5] phase 1: decoupled-loss pets_cadm cells (cripple_ant + cheetah)"
if [ -f results/raw/cripple_ant__pets_cadm__s0.json ] && \
   [ ! -f results/raw_r4b_additive/cripple_ant__pets_cadm__s0.json ]; then
  mkdir -p results/raw_r4b_additive
  mv results/raw/cripple_ant__pets_cadm__s0.json results/raw_r4b_additive/
  rm -f results/raw/cripple_ant__pets_cadm__s0.attempts
  echo "[r5] archived the additive-anchor cripple_ant pets_cadm cell"
fi
if [ -f results/raw/half_cheetah__pets_cadm__s0.json ] && \
   [ ! -f results/raw_r4_preanchor/half_cheetah__pets_cadm__s0.json ]; then
  mkdir -p results/raw_r4_preanchor
  mv results/raw/half_cheetah__pets_cadm__s0.json results/raw_r4_preanchor/
  rm -f results/raw/half_cheetah__pets_cadm__s0.attempts
  echo "[r5] archived the pre-anchor (det-ensemble) cheetah pets_cadm cell"
fi
bash scripts/matrix_loop.sh --families cripple_ant half_cheetah --models pets_cadm --seeds 0

echo "[r5] phase 2: slim_humanoid pets_cadm crash diagnosis (real-cell itr2)"
timeout 3600 python scripts/probe_rows.py \
  --probe slim_humanoid:pets_cadm --itr2-budgets 32768 66560 || true
if python - <<'EOF'
import json, sys
try:
    probes = json.load(open("results/row_fault_probe.json"))
    trials = probes.get("slim_humanoid:pets_cadm:itr2", {}).get("trials", {})
    sys.exit(0 if trials.get("66560") else 1)
except Exception:
    sys.exit(1)
EOF
then
  echo "[r5] single-block itr2 passed; clearing .crashed and running the cell"
  rm -f results/raw/slim_humanoid__pets_cadm__s0.crashed \
        results/raw/slim_humanoid__pets_cadm__s0.attempts
  bash scripts/matrix_loop.sh --families slim_humanoid --models pets_cadm --seeds 0
else
  echo "[r5] single-block itr2 did NOT pass; leaving .crashed in place"
fi

echo "[r5] phase 3: plain-Ant family (s0)"
bash scripts/matrix_loop.sh --families ant --models vanilla cadm pets_cadm --seeds 0

echo "[r5] queue phases 1-3 complete"
