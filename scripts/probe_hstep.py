"""Open-loop H-step error of a trained-model snapshot against the REAL env.

The round-4 diagnosis chain left a gap: the collapsed
``cripple_ant__pets_cadm__s0`` model is only ~1.17x worse than the healthy
``cadm__s0`` on ONE-step error (/tmp/perdim.log) and never leaves the healthy
envelope over 30 rollout steps (scripts/probe_blowup.py), yet controls at 65
return vs 4700. The quantity the planner actually consumes is the
H-step OPEN-LOOP trajectory: predicted obs fed back in for ``plan_horizon``
steps. This probe rolls the same random action sequence through (a) the real
env and (b) the model (ensemble-mean prediction, frozen z from each env's
collected history — exactly the planner's conditioning), and reports the
per-step normalized MSE between the two trajectories.

Normalization: per-dim std of the REAL trajectory's obs across (env, step),
so numbers are comparable across snapshots of the same family. Real-env
terminations mask all later steps for that env.

Usage:
  python scripts/probe_hstep.py --cell cripple_ant__pets_cadm__s0
  python scripts/probe_hstep.py --cell cripple_ant__cadm__s0 --horizon 30
  python scripts/probe_hstep.py --ckpt /path/snap.pkl --cell fam__model__s0
"""
from __future__ import annotations

import argparse
import json
import os
import pickle
import sys

import numpy as np

os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/root/repo/.jax_cache")
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

OUT_DIR = os.path.join(os.path.dirname(__file__), "..", "results", "hstep_probe")


def run_probe(cell: str, ckpt_path: str | None = None, n_envs: int | None = None,
              horizon: int | None = None, collect_steps: int | None = None,
              seed: int = 99) -> dict:
    import jax
    import jax.numpy as jnp

    from scripts.run_matrix import CKPT_DIR, FAMILY_BASE, MODEL_VARIANTS
    from cadm_tpu.cli.presets import ExperimentConfig

    family, model, seed_s = cell.split("__")
    with open(ckpt_path or os.path.join(CKPT_DIR, cell + ".pkl"), "rb") as f:
        dyn_state = pickle.load(f)

    kwargs = {**FAMILY_BASE[family], **MODEL_VARIANTS[model]}
    if n_envs:
        kwargs["n_envs"] = n_envs
    if collect_steps:
        kwargs["steps_per_itr"] = collect_steps
    cfg = ExperimentConfig(**kwargs, seed=int(seed_s[1:]))
    env, dyn, planner, trainer = cfg.build()
    h = horizon or cfg.plan_horizon

    # fresh on-distribution start states + histories (same recipe as
    # probe_blowup: a short random-policy collect in the cell's family)
    rng = jax.random.key(seed)
    env_states, hists, buffer, _ = trainer.init(rng)
    env_states, hists, buffer, _ = trainer._collect_random(
        rng, env_states, hists, buffer, dyn_state
    )
    obs0 = jax.vmap(env.observe)(env_states.params, env_states.phys)
    z = dyn.context_from_history(dyn_state.params, dyn_state.norm, hists)
    e = obs0.shape[0]
    params, norm = dyn_state.params, dyn_state.norm
    n = dyn.cfg.n_members

    actions = jax.random.uniform(
        jax.random.key(7), (h, e, env.act_dim), minval=-1, maxval=1
    )

    # (a) real-env open-loop rollout; a done masks every later step
    def real_step(carry, a_t):
        states, alive = carry
        states, obs, rew, done = jax.vmap(env.step)(states, a_t)
        alive = alive * (1.0 - done.astype(obs.dtype))
        return (states, alive), (obs, alive)

    (_, _), (real_obs, alive) = jax.lax.scan(
        real_step, (env_states, jnp.ones((e,))), actions
    )  # (h, e, d), (h, e)

    # (b) model open-loop rollout: ensemble-MEAN next-obs fed back in,
    # z frozen (the planner's conditioning; sample_predictions=False default)
    def model_step(obs, a_t):
        preds = jax.vmap(
            lambda fwd_m: dyn.predict(params, norm, fwd_m, obs, a_t, z, None)
        )(params["fwd"])                      # (n, e, d)
        nxt = preds.mean(0)
        return nxt, nxt

    _, pred_obs = jax.lax.scan(model_step, obs0, actions)  # (h, e, d)

    # (c) per-member open-loop rollouts: each member propagates ITS OWN
    # trajectory (what TS∞ does, and what TS1 approximates per block). If
    # the members' trajectories fan out, TS1-blended candidate returns are
    # dominated by member noise even when the ensemble MEAN is accurate —
    # CEM then cannot rank candidates (the suspected 5-member cripple_ant
    # failure with a mean-accurate final model).
    def member_step(obs_m, a_t):
        nxt = jax.vmap(
            lambda fwd_m, o: dyn.predict(params, norm, fwd_m, o, a_t, z, None)
        )(params["fwd"], obs_m)              # (n, e, d)
        return nxt, nxt

    obs0_m = jnp.broadcast_to(obs0, (n,) + obs0.shape)
    _, member_obs = jax.lax.scan(member_step, obs0_m, actions)  # (h, n, e, d)

    real_obs = np.asarray(real_obs)
    pred_obs = np.asarray(pred_obs)
    member_obs = np.asarray(member_obs)
    alive = np.asarray(alive)

    std = real_obs.reshape(-1, real_obs.shape[-1]).std(0) + 1e-8  # (d,)
    sq = (((pred_obs - real_obs) / std) ** 2).mean(-1)            # (h, e)
    w = alive / np.maximum(alive.sum(1, keepdims=True), 1e-8)
    mse_by_step = (sq * w).sum(1)                                 # (h,)

    # per-member error (vs real) and cross-member trajectory spread, both in
    # the same normalized units as openloop_nmse
    m_sq = (((member_obs - real_obs[:, None]) / std) ** 2).mean(-1)  # (h,n,e)
    member_nmse_by_step = (m_sq * w[:, None]).sum(-1)                # (h, n)
    spread = ((member_obs.std(1) / std) ** 2).mean(-1)               # (h, e)
    spread_by_step = (spread * w).sum(1)                             # (h,)

    out = {
        "cell": cell, "n_envs": int(e), "members": int(n), "horizon": int(h),
        "alive_frac_by_step": [round(float(v), 4) for v in alive.mean(1)],
        "openloop_nmse_by_step": [round(float(v), 4) for v in mse_by_step],
        "openloop_nmse_final": round(float(mse_by_step[-1]), 4),
        "openloop_nmse_mean": round(float(mse_by_step.mean()), 4),
        "member_nmse_final": [round(float(v), 4) for v in member_nmse_by_step[-1]],
        "member_spread_by_step": [round(float(v), 4) for v in spread_by_step],
        "member_spread_final": round(float(spread_by_step[-1]), 4),
    }
    return out


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--cell", required=True)
    ap.add_argument("--ckpt", default=None, help="explicit snapshot path")
    ap.add_argument("--n-envs", type=int, default=None)
    ap.add_argument("--horizon", type=int, default=None)
    ap.add_argument("--collect-steps", type=int, default=None)
    args = ap.parse_args()

    out = run_probe(args.cell, args.ckpt, args.n_envs, args.horizon,
                    args.collect_steps)
    os.makedirs(OUT_DIR, exist_ok=True)
    with open(os.path.join(OUT_DIR, args.cell + ".json"), "w") as f:
        json.dump(out, f, indent=2)
    print(json.dumps(out, indent=2), flush=True)


if __name__ == "__main__":
    main()
