"""Open-loop H-step probe plumbing (scripts/probe_hstep.py): an untrained
cartpole snapshot must produce finite per-step normalized errors over the
full horizon, and the real-env termination mask must stay in [0, 1]."""
import os
import pickle
import sys

import jax
import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from scripts.probe_hstep import run_probe


def test_probe_hstep_untrained_snapshot(tmp_path):
    from cadm_tpu.cli.presets import ExperimentConfig
    from scripts.run_matrix import FAMILY_BASE, MODEL_VARIANTS

    kwargs = {**FAMILY_BASE["cartpole"], **MODEL_VARIANTS["cadm"]}
    cfg = ExperimentConfig(**kwargs, seed=0)
    env, dyn, planner, trainer = cfg.build()
    dyn_state = dyn.init_state(jax.random.key(0))
    snap = jax.tree.map(np.asarray, dyn_state)
    path = tmp_path / "cartpole__cadm__s0.pkl"
    with open(path, "wb") as f:
        pickle.dump(snap, f)

    out = run_probe("cartpole__cadm__s0", ckpt_path=str(path),
                    n_envs=4, horizon=6, collect_steps=30)
    assert out["horizon"] == 6 and out["n_envs"] == 4
    assert len(out["openloop_nmse_by_step"]) == 6
    assert all(np.isfinite(v) for v in out["openloop_nmse_by_step"])
    assert all(0.0 <= v <= 1.0 for v in out["alive_frac_by_step"])
    # an untrained model's open-loop error must be visibly nonzero
    assert out["openloop_nmse_mean"] > 1e-3
    assert len(out["member_nmse_final"]) == out["members"]
    assert len(out["member_spread_by_step"]) == 6
    # a 1-member "ensemble" has zero cross-member spread by construction
    if out["members"] == 1:
        assert out["member_spread_final"] == 0.0
