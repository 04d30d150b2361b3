#!/bin/bash
# Round-5 phase C queue — the round's two replicated defects + the range
# probe, run as soon as the seed-1 sweep (r5b) releases the chip:
#   1. pets_cadm_mse A/B on cheetah: both cheetah PE-TS+CaDM seeds degrade
#      mid-run under loss-gated early stop (valid fwd MSE spikes to 0.33,
#      epochs_run falls to 3) — gate on the planner-visible fwd-mean MSE.
#   2. cadm_aug on cripple_ant: leg-symmetry train augmentation vs the
#      probe-confirmed held-out-leg aliasing.
#   3. probe_ranges: model-free potency of the hopper/slim_humanoid ranges
#      (VERDICT #5) — random policy AND trained-planner rollouts at fixed
#      true-sim scales.
set -u
cd "$(dirname "$0")/.."

echo "[r5c] 1: cheetah pets_cadm_mse s0 (early-stop A/B)"
bash scripts/matrix_loop.sh --families half_cheetah --models pets_cadm_mse --seeds 0
echo "[r5c] 2: cripple_ant cadm_aug s0 (leg-symmetry augmentation)"
bash scripts/matrix_loop.sh --families cripple_ant --models cadm_aug --seeds 0
echo "[r5c] 3: range-potency probe (true-sim fixed scales)"
timeout 3600 python scripts/probe_ranges.py --families hopper slim_humanoid half_cheetah || true
echo "[r5c] complete"
