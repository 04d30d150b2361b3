"""Offline blowup analysis of a trained-model snapshot (VERDICT r3 weak #2
"undiagnosed" tool): how often do planner-style TS1 rollouts through the
saved ensemble leave the env's healthy-state envelope, and how soon?

Loads results/ckpt/<cell>.pkl (written by scripts/run_matrix.py), collects
fresh windows in the cell's env family, rolls random candidate action
sequences through the model exactly like the TS1 planner does (WITHOUT the
round-4 guard, to measure the raw model), and reports per-horizon-step:
  - alive fraction (rows still inside bad_transition limits),
  - max |predicted obs|,
  - non-finite fraction.

Usage:
  python scripts/probe_blowup.py --cell cripple_ant__pets_cadm__s0
  python scripts/probe_blowup.py --cell half_cheetah__pets_cadm__s0 --n-envs 16
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

OUT_DIR = os.path.join(os.path.dirname(__file__), "..", "results", "blowup_probe")


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--cell", required=True)
    ap.add_argument("--n-envs", type=int, default=None)
    ap.add_argument("--steps", type=int, default=None)
    ap.add_argument("--candidates", type=int, default=None)
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp

    from scripts.run_matrix import CKPT_DIR, FAMILY_BASE, MODEL_VARIANTS
    from cadm_tpu.cli.presets import ExperimentConfig

    family, model, seed_s = args.cell.split("__")
    with open(os.path.join(CKPT_DIR, args.cell + ".pkl"), "rb") as f:
        dyn_state = pickle.load(f)

    kwargs = {**FAMILY_BASE[family], **MODEL_VARIANTS[model]}
    if args.n_envs:
        kwargs["n_envs"] = args.n_envs
    if args.steps:
        kwargs["steps_per_itr"] = args.steps
    cfg = ExperimentConfig(**kwargs, seed=int(seed_s[1:]))
    env, dyn, planner, trainer = cfg.build()

    rng = jax.random.key(99)
    env_states, hists, buffer, _ = trainer.init(rng)
    env_states, hists, buffer, _ = trainer._collect_random(
        rng, env_states, hists, buffer, dyn_state
    )
    obs_all = jax.vmap(env.observe)(env_states.params, env_states.phys)
    z_all = dyn.context_from_history(dyn_state.params, dyn_state.norm, hists)

    n = dyn.cfg.n_members
    c = args.candidates or cfg.n_candidates
    cm = -(-c // n)
    h = cfg.plan_horizon
    e = min(8, obs_all.shape[0])
    params, norm = dyn_state.params, dyn_state.norm
    lim_obs, lim_dobs = env.bad_obs_limit, env.bad_dobs_limit

    def rollout(obs0, z, key):
        """Unguarded TS1 rollout; returns per-step (alive_frac, max_abs,
        nonfinite_frac)."""
        k_a, k_r = jax.random.split(key)
        actions = jax.random.uniform(k_a, (cm * n, h, env.act_dim),
                                     minval=-1, maxval=1)
        acts = actions.reshape(n, cm, h, env.act_dim)
        obs = jnp.broadcast_to(obs0, (n, cm, obs0.shape[-1]))
        z_b = jnp.broadcast_to(z, (n, cm, z.shape[-1]))
        alive = jnp.ones((n, cm))

        def step(carry, xs):
            obs, alive, rng = carry
            a_t, = xs
            rng, k_perm = jax.random.split(rng)
            perm = jax.random.permutation(k_perm, n)
            inv = jnp.argsort(perm)
            pred = jax.vmap(
                lambda fwd_m, o, a_m, zz: dyn.predict(
                    params, norm, fwd_m, o, a_m, zz, None
                )
            )(params["fwd"], obs[inv], a_t[inv], z_b)
            nxt = pred[perm]
            bad = (
                (jnp.abs(nxt).max(axis=-1) > lim_obs)
                | (jnp.abs(nxt - obs).max(axis=-1) > lim_dobs)
                | ~jnp.isfinite(nxt).all(axis=-1)
            )
            alive = alive * (1.0 - bad.astype(obs.dtype))
            stats = (
                alive.mean(),
                jnp.abs(jnp.nan_to_num(nxt, nan=jnp.inf, posinf=jnp.inf,
                                       neginf=-jnp.inf)).max(),
                1.0 - jnp.isfinite(nxt).all(axis=-1).mean(),
            )
            return (nxt, alive, rng), stats

        a_seq = jnp.swapaxes(acts, 0, 2).swapaxes(1, 2)
        (_, _, _), stats = jax.lax.scan(step, (obs, alive, k_r), (a_seq,))
        return stats

    f = jax.jit(jax.vmap(rollout))
    alive, mx, nonfin = f(
        obs_all[:e], z_all[:e], jax.random.split(jax.random.key(7), e)
    )
    alive = np.asarray(alive)   # (e, h)
    mx = np.asarray(mx)
    nonfin = np.asarray(nonfin)
    out = {
        "cell": args.cell, "n_start_states": int(e),
        "candidates": int(c), "members": int(n), "horizon": int(h),
        "alive_frac_by_step": [round(float(v), 4) for v in alive.mean(0)],
        "max_abs_pred_by_step": [float(v) for v in mx.mean(0)],
        "nonfinite_frac_by_step": [round(float(v), 4) for v in nonfin.mean(0)],
        "alive_frac_final": round(float(alive[:, -1].mean()), 4),
    }
    os.makedirs(OUT_DIR, exist_ok=True)
    with open(os.path.join(OUT_DIR, args.cell + ".json"), "w") as f2:
        json.dump(out, f2, indent=2)
    print(json.dumps(out, indent=2), flush=True)


if __name__ == "__main__":
    main()
