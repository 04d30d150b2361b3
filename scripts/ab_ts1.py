"""A/B: block-granular TS1 (the TPU-friendly variant, PlannerConfig
'ts1') vs the PETS paper's exact per-candidate TS1 ('ts1_exact').

VERDICT r3 weak #6: the block variant is a semantic deviation from PETS
whose effect on CEM elite selection was argued, not measured. This script
measures it on CPU with a real trained probabilistic ensemble:

1. Train a 5-member ensemble on CartPole transitions (analytic env).
2. For a batch of start states and a FIXED candidate set, estimate each
   candidate's return under each propagation mode, many rng draws per mode.
3. Report:
   - cross-mode return correlation (mean-over-draws estimates),
   - top-k elite overlap between modes,
   - the SAME overlap between independent draws WITHIN exact TS1 — the
     sampling-noise floor any TS1 implementation lives with. The block
     variant is behaviorally equivalent iff mode-vs-mode disagreement is
     within that floor.
4. Closed-loop CartPole returns with CEM under each mode (same seeds).

Writes results/ab_ts1.json and prints a summary.
"""
from __future__ import annotations

import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import dataclasses

import jax
import jax.numpy as jnp


def train_cartpole_ensemble(n_members=5, steps=3000, batch=256, seed=0):
    from cadm_tpu.envs import make
    from cadm_tpu.models.dynamics import Dynamics, DynamicsConfig, SegmentBatch

    env = make("cartpole")
    cfg = DynamicsConfig(
        obs_dim=env.obs_dim, act_dim=env.act_dim, hidden=(64, 64),
        n_members=n_members, probabilistic=True, history_k=2, future_m=1,
        lr=1e-3,
    )
    model = Dynamics(cfg)
    state = model.init_state(jax.random.key(seed))

    # random-policy transitions, env params resampled per rollout chunk
    def collect(rng, n_env=64, t=50):
        r_reset, r_act = jax.random.split(rng)
        states = jax.vmap(lambda k: env.reset(k, 0))(
            jax.random.split(r_reset, n_env)
        )

        def step(carry, k):
            st = carry
            a = jax.random.uniform(
                k, (n_env, env.act_dim), minval=-1, maxval=1
            )
            nst, obs, rew, done = jax.vmap(env.step)(st, a)
            return nst, (jax.vmap(env.observe)(st.params, st.phys), a,
                         obs)
        _, (obs, act, nobs) = jax.lax.scan(
            step, states, jax.random.split(r_act, t)
        )
        return (obs.reshape(-1, env.obs_dim), act.reshape(-1, env.act_dim),
                nobs.reshape(-1, env.obs_dim))

    obs, act, nobs = jax.jit(collect)(jax.random.key(seed + 1))
    n = obs.shape[0]
    # norm stats from the dataset
    from cadm_tpu.models.dynamics import NormStats

    dobs = nobs - obs
    norm = NormStats(
        obs_mean=obs.mean(0), obs_std=obs.std(0) + 1e-6,
        act_mean=act.mean(0), act_std=act.std(0) + 1e-6,
        dobs_mean=dobs.mean(0), dobs_std=dobs.std(0) + 1e-6,
    )
    state = dataclasses.replace(state, norm=norm)
    upd = jax.jit(model.update)

    def make_batch(k):
        idx = jax.random.randint(k, (n_members, batch), 0, n)
        z = jnp.zeros
        return SegmentBatch(
            hist_obs=z((n_members, batch, 2, env.obs_dim)),
            hist_dobs=z((n_members, batch, 2, env.obs_dim)),
            hist_act=z((n_members, batch, 2, env.act_dim)),
            hist_valid=z((n_members, batch, 2)),
            obs=obs[idx][:, :, None],
            act=act[idx][:, :, None],
            next_obs=nobs[idx][:, :, None],
            valid=jnp.ones((n_members, batch, 1)),
        )

    mb = jax.jit(make_batch)
    for i in range(steps):
        state, metrics = upd(state, mb(jax.random.key(10_000 + i)))
    print(f"[ab_ts1] trained: loss={float(metrics['model_loss']):.4f} "
          f"fwd_mse={float(metrics['fwd_mean_mse']):.4f}", flush=True)
    return env, model, state


def elite_study(env, model, state, n_obs=8, c=200, h=20, k_elite=20,
                draws=20, seed=0):
    from cadm_tpu.planners.mpc import MPCPlanner, PlannerConfig

    base = PlannerConfig(kind="cem", horizon=h, n_candidates=c,
                         cem_elites=k_elite)
    planners = {
        mode: MPCPlanner(
            dataclasses.replace(base, ensemble_eval=mode),
            model, env.reward, env.act_dim,
        )
        for mode in ("ts1", "ts1_exact")
    }
    r_obs, r_act, r_eval = jax.random.split(jax.random.key(seed), 3)
    states = jax.vmap(lambda k: env.reset(k, 0))(
        jax.random.split(r_obs, n_obs)
    )
    obs = jax.vmap(env.observe)(states.params, states.phys)
    actions = jax.random.uniform(
        r_act, (n_obs, c, h, env.act_dim), minval=-1, maxval=1
    )
    z = jnp.zeros((n_obs, 0))

    rets = {}
    for mode, p in planners.items():
        f = jax.jit(
            jax.vmap(
                lambda o, zz, a, k: p._evaluate(
                    state.params, state.norm, o, zz, a, k
                )
            )
        )
        per_draw = []
        for d in range(draws):
            keys = jax.random.split(
                jax.random.key(1000 * d + seed), n_obs
            )
            per_draw.append(np.asarray(f(obs, z, actions, keys)))
        rets[mode] = np.stack(per_draw)  # (draws, n_obs, c)

    def topk_overlap(a, b):
        """Mean |topk(a) ∩ topk(b)| / k over the obs batch."""
        out = []
        for i in range(a.shape[0]):
            ta = set(np.argsort(a[i])[-k_elite:])
            tb = set(np.argsort(b[i])[-k_elite:])
            out.append(len(ta & tb) / k_elite)
        return float(np.mean(out))

    mean_block = rets["ts1"].mean(0)
    mean_exact = rets["ts1_exact"].mean(0)
    corr = float(np.corrcoef(mean_block.ravel(), mean_exact.ravel())[0, 1])
    cross = topk_overlap(mean_block, mean_exact)
    # sampling-noise floor: independent half-splits of the exact draws
    ha = rets["ts1_exact"][0::2].mean(0)
    hb = rets["ts1_exact"][1::2].mean(0)
    floor_exact = topk_overlap(ha, hb)
    hc = rets["ts1"][0::2].mean(0)
    hd = rets["ts1"][1::2].mean(0)
    floor_block = topk_overlap(hc, hd)
    single_draw_cross = topk_overlap(rets["ts1"][0], rets["ts1_exact"][0])
    single_draw_floor = topk_overlap(
        rets["ts1_exact"][0], rets["ts1_exact"][1]
    )
    return {
        "n_obs": n_obs, "candidates": c, "horizon": h, "elites": k_elite,
        "draws_per_mode": draws,
        "return_correlation_block_vs_exact": corr,
        "elite_overlap_block_vs_exact": cross,
        "elite_overlap_exact_vs_exact_noise_floor": floor_exact,
        "elite_overlap_block_vs_block_noise_floor": floor_block,
        "single_draw_overlap_block_vs_exact": single_draw_cross,
        "single_draw_overlap_exact_vs_exact": single_draw_floor,
    }


def closed_loop(env, model, state, mode, seed, episodes=16, t=200):
    from cadm_tpu.planners.mpc import MPCPlanner, PlannerConfig

    p = MPCPlanner(
        PlannerConfig(kind="cem", horizon=20, n_candidates=100,
                      cem_iters=4, cem_elites=10, ensemble_eval=mode,
                      warm_start=True),
        model, env.reward, env.act_dim,
    )

    @jax.jit
    def run(rng):
        r0, r1 = jax.random.split(rng)
        states = jax.vmap(lambda k: env.reset(k, 0))(
            jax.random.split(r0, episodes)
        )
        mu = p.init_plan(episodes)

        def body(carry, k):
            st, mu, tot = carry
            o = jax.vmap(env.observe)(st.params, st.phys)
            a, mu = p.plan(state, o, jnp.zeros((episodes, 0)), k, mu)
            nst, _, rew, done = jax.vmap(env.step)(st, a)
            return (nst, mu, tot + rew), None

        (st, mu, tot), _ = jax.lax.scan(
            body, (states, mu, jnp.zeros(episodes)), jax.random.split(r1, t)
        )
        return tot.mean()

    return float(run(jax.random.key(seed)))


def main():
    t0 = time.time()
    env, model, state = train_cartpole_ensemble()
    study = elite_study(env, model, state)
    print("[ab_ts1] elite study:", json.dumps(study, indent=2), flush=True)
    cl = {}
    for mode in ("ts1", "ts1_exact"):
        cl[mode] = [closed_loop(env, model, state, mode, s) for s in (0, 1)]
        print(f"[ab_ts1] closed-loop {mode}: {cl[mode]}", flush=True)
    out = {"elite_study": study, "closed_loop_mean_reward_sum": cl,
           "wall_s": time.time() - t0}
    path = os.path.join(os.path.dirname(__file__), "..", "results",
                        "ab_ts1.json")
    with open(path, "w") as f:
        json.dump(out, f, indent=2)
    print(f"[ab_ts1] wrote {path} in {out['wall_s']:.0f}s", flush=True)


if __name__ == "__main__":
    main()
