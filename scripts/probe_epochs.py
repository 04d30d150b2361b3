#!/usr/bin/env python
"""Offline convergence audit over every recorded matrix cell (no TPU needed).

Round-4 verdict weak #8 asked: at matrix scale ``max_epochs=8`` +
``epoch_updates_cap=400`` means early stop may almost never fire — are the
HEALTHY families also training under-converged, with the NLL/MSE still
falling when the epoch cap cuts the fit off?  The collapsed round-4
cripple_ant cell showed epochs_run pinned at 8 with valid loss falling
monotonically for 18 iterations.

Every cell JSON in results/raw/ records per-iteration ``fit/epochs_run``
(epochs actually executed before early stop or cap) and
``fit/valid_fwd_mse_after``, so the question is answerable offline:

* ``cap_frac``     — fraction of iterations where epochs_run == max_epochs
                     (early stop never fired; fit ended on the cap).
* ``late_cap_frac``— same, restricted to the last half of training, where
                     the replay buffer is large and epochs are expensive;
                     early iterations hitting the cap is expected (tiny
                     buffer, model far from converged) and benign.
* ``mse_tail_ratio`` — valid fwd MSE at the last iteration / minimum over
                     the run.  >~2 means the model got WORSE after its best
                     point (the cheetah shared-trunk degradation signature);
                     ~1 means converged-and-held.

Writes results/epochs_audit.json and prints a table.  Reference framing:
SURVEY.md §3.3 (epoch-fit protocol), VERDICT.md round-4 weak #8.
"""
from __future__ import annotations

import glob
import json
import math
import os
import sys

RAW = os.path.join(os.path.dirname(__file__), "..", "results", "raw")


def audit_cell(path: str) -> dict | None:
    with open(path) as f:
        d = json.load(f)
    hist = d.get("history") or []
    runs = [h.get("fit/epochs_run") for h in hist if h.get("fit/epochs_run") is not None]
    mses = [
        h.get("fit/valid_fwd_mse_after")
        for h in hist
        if h.get("fit/valid_fwd_mse_after") is not None
        and not math.isnan(h.get("fit/valid_fwd_mse_after"))
    ]
    if not runs:
        return None
    cap = max(d.get("config", {}).get("max_epochs", 8), max(runs))
    n = len(runs)
    at_cap = [r >= cap for r in runs]
    late = at_cap[n // 2 :]
    out = {
        "cell": os.path.basename(path)[: -len(".json")],
        "iters": n,
        "epoch_cap": cap,
        "cap_frac": round(sum(at_cap) / n, 3),
        "late_cap_frac": round(sum(late) / max(len(late), 1), 3),
    }
    if mses:
        best = min(mses)
        out["valid_fwd_mse_last"] = round(mses[-1], 5)
        out["valid_fwd_mse_best"] = round(best, 5)
        out["mse_tail_ratio"] = round(mses[-1] / best, 2) if best > 0 else None
    return out


def main() -> int:
    rows = []
    for path in sorted(glob.glob(os.path.join(RAW, "*.json"))):
        try:
            row = audit_cell(path)
        except (json.JSONDecodeError, KeyError):
            continue
        if row is not None:
            rows.append(row)
    out_path = os.path.join(RAW, "..", "epochs_audit.json")
    with open(out_path, "w") as f:
        json.dump(rows, f, indent=1)
    hdr = f"{'cell':42s} {'itrs':>4s} {'cap%':>5s} {'late%':>5s} {'mse_last':>9s} {'mse_best':>9s} {'tail':>5s}"
    print(hdr)
    print("-" * len(hdr))
    for r in rows:
        print(
            f"{r['cell']:42s} {r['iters']:4d} {r['cap_frac']:5.0%} {r['late_cap_frac']:5.0%} "
            f"{r.get('valid_fwd_mse_last', float('nan')):9.4f} "
            f"{r.get('valid_fwd_mse_best', float('nan')):9.4f} "
            f"{(r.get('mse_tail_ratio') or float('nan')):5.2f}"
        )
    print(f"\nwrote {os.path.normpath(out_path)}")
    return 0


if __name__ == "__main__":
    sys.exit(main())
