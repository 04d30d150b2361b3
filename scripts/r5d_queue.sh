#!/bin/bash
# Round-5 phase D — the decisive test of the trunk-interference mechanism:
# pets_cadm_mse REFUTED the early-stop-gate hypothesis (identical mid-run
# degradation with the MSE gate active, returns 2619 -> 322, fwd MSE
# 0.024 -> 0.12 across iterations). pets_cadm_dv blocks the remaining NLL
# gradient path (logvar -> shared trunk); if it holds ~5400 like the
# deterministic control, the mechanism is confirmed and PE-TS+CaDM gets a
# healthy protocol on cheetah.
set -u
cd "$(dirname "$0")/.."
echo "[r5d] cheetah pets_cadm_dv s0 (trunk-detached variance head)"
bash scripts/matrix_loop.sh --families half_cheetah --models pets_cadm_dv --seeds 0
echo "[r5d] complete"
