"""Range-potency probe (VERDICT r4 missing #5 / weak #3): do the shifted
dynamics ranges actually change the TASK on hopper / slim_humanoid?

RESULTS.md shows hopper extreme BEATING train (1512/1549/1568) and
slim_humanoid moving <7% across a +-80% mass/damping scale — either the
global-scalar randomization under the MBBL fixed-horizon protocol is too
forgiving (per-step replanning compensates), or these families genuinely
don't separate. This probe measures it model-free of any LEARNED-model
adaptation: roll the TRUE simulator at FIXED hidden scales under
  (a) a random-uniform policy, and
  (b) a trained planner snapshot (results/ckpt/<family>__vanilla__s0.pkl,
      planning through its learned model while the real env runs at the
      fixed scale),
and decompose the return into its velocity component vs the constant alive
bonus. If even the trained planner's VELOCITY return barely moves from
scale 0.2 to 1.8, the family does not separate under this protocol and
RESULTS.md should say so; if velocity moves but the alive-bonus floor
hides it, the ranges are potent and the return metric just compresses.

Usage:
  python scripts/probe_ranges.py --families hopper slim_humanoid half_cheetah
"""
from __future__ import annotations

import argparse
import dataclasses
import json
import os
import pickle
import sys

import numpy as np

os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/root/repo/.jax_cache")
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

OUT_PATH = os.path.join(
    os.path.dirname(__file__), "..", "results", "range_potency.json"
)

SCALES = [0.2, 0.5, 1.0, 1.5, 1.8]


def make_rollout(env, n_envs, policy):
    """Jittable: (scale, seed_key) -> per-env (return, velocity_return).

    ``policy`` is a dict of closures: init(n) -> aux pytree,
    act(states, aux, k) -> (actions, aux), post(aux, prev, obs, act) -> aux.
    One full fixed-horizon episode per env at a PINNED hidden scale.
    """
    import jax
    import jax.numpy as jnp

    vx_index = getattr(env, "_vx_index", None)
    horizon = env.horizon

    def run(scale, rng):
        r_reset, r_run = jax.random.split(rng)
        states = jax.vmap(lambda k: env.reset(k, 0))(
            jax.random.split(r_reset, n_envs)
        )
        states = dataclasses.replace(
            states,
            params=jax.tree.map(
                lambda x: jnp.full_like(x, scale), states.params
            ),
        )

        def step(carry, k):
            states, aux, ret, vel_ret, alive = carry
            actions, aux = policy["act"](states, aux, k)
            prev_obs = states.obs
            next_states, obs, reward, done = jax.vmap(
                lambda s, a: env.step(s, a, 0)
            )(states, actions)
            aux = policy["post"](aux, prev_obs, obs, actions)
            ret = ret + reward * alive
            if vx_index is not None:
                vel_ret = vel_ret + obs[:, vx_index] * alive
            alive = alive * (1.0 - done.astype(jnp.float32))
            return (next_states, aux, ret, vel_ret, alive), None

        zeros = jnp.zeros(n_envs)
        (_, _, ret, vel_ret, _), _ = jax.lax.scan(
            step,
            (states, policy["init"](n_envs), zeros, zeros, jnp.ones(n_envs)),
            jax.random.split(r_run, horizon),
        )
        return ret, vel_ret

    return run


def random_policy(env):
    import jax

    return {
        "init": lambda n: None,
        "act": lambda states, aux, k: (
            jax.random.uniform(
                k, (states.obs.shape[0], env.act_dim), minval=-1.0, maxval=1.0
            ),
            aux,
        ),
        "post": lambda aux, prev, obs, act: aux,
    }


def planner_policy(env, model, planner, dyn_state):
    """Plan through the trained snapshot; aux = (history, plan_mu)."""
    from cadm_tpu.train.mb_trainer import batched_history

    def act(states, aux, k):
        hists, plan_mu = aux
        z = model.context_from_history(dyn_state.params, dyn_state.norm, hists)
        actions, plan_mu = planner.plan(dyn_state, states.obs, z, k, plan_mu)
        return actions, (hists, plan_mu)

    def post(aux, prev_obs, obs, actions):
        hists, plan_mu = aux
        hists = model.push_history(
            dyn_state.params, dyn_state.norm, hists,
            prev_obs, obs - prev_obs, actions,
        )
        return (hists, plan_mu)

    return {
        "init": lambda n: (batched_history(model.cfg, n), planner.init_plan(n)),
        "act": act,
        "post": post,
    }


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument(
        "--families", nargs="*",
        default=["hopper", "slim_humanoid", "half_cheetah"],
    )
    ap.add_argument("--n-envs", type=int, default=16)
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp

    from scripts.run_matrix import CKPT_DIR, FAMILY_BASE, MODEL_VARIANTS
    from cadm_tpu.cli.presets import ExperimentConfig

    results = {}
    if os.path.exists(OUT_PATH):
        with open(OUT_PATH) as f:
            results = json.load(f)

    for family in args.families:
        kwargs = {**FAMILY_BASE[family], **MODEL_VARIANTS["vanilla"]}
        cfg = ExperimentConfig(**kwargs, seed=0)
        env, model, planner, trainer = cfg.build()
        policies = {"random": random_policy(env)}
        ckpt = os.path.join(CKPT_DIR, f"{family}__vanilla__s0.pkl")
        if os.path.exists(ckpt):
            with open(ckpt, "rb") as f:
                dyn_state = pickle.load(f)
            dyn_state = jax.tree.map(jnp.asarray, dyn_state)
            policies["planner_vanilla_s0"] = planner_policy(
                env, model, planner, dyn_state
            )
        fam_out = {
            "horizon": env.horizon,
            "alive_bonus": float(getattr(env, "alive_bonus", 0.0)),
            "n_envs": args.n_envs,
            "scales": {},
        }
        for pname, pol in policies.items():
            run = jax.jit(make_rollout(env, args.n_envs, pol))
            for scale in SCALES:
                ret, vel = run(
                    jnp.asarray(scale), jax.random.key(17 + int(scale * 10))
                )
                ret, vel = np.asarray(ret), np.asarray(vel)
                fam_out["scales"].setdefault(str(scale), {})[pname] = {
                    "return_mean": float(ret.mean()),
                    "return_std": float(ret.std()),
                    "velocity_return_mean": float(vel.mean()),
                }
                print(f"[ranges] {family} scale={scale} {pname}: "
                      f"ret={ret.mean():.1f}±{ret.std():.1f} "
                      f"vel_ret={vel.mean():.1f}", flush=True)
        results[family] = fam_out
        with open(OUT_PATH, "w") as f:
            json.dump(results, f, indent=2)
    print(f"[ranges] wrote {OUT_PATH}", flush=True)


if __name__ == "__main__":
    main()
