"""Benchmark: vmapped randomized-dynamics sim + CEM planning + model training.

Prints ONE JSON line to stdout:
  {"metric": ..., "value": N, "unit": ..., "vs_baseline": N}

Headline metric = HalfCheetah env steps/sec (vmapped pure-JAX physics with
per-env hidden dynamics params, fully jitted). vs_baseline is the ratio to
the driver target of 1,000,000 steps/sec (BASELINE.md — the reference itself
publishes no throughput numbers; it steps MuJoCo through python pipes at
O(1e3-1e4) steps/sec).

Secondary metrics (CEM model-rollouts/sec, dynamics-model train steps/sec)
go to stderr so the stdout contract stays one line.

Usage: python bench.py [--smoke]   (--smoke = tiny CPU-safe shapes)
"""
from __future__ import annotations

import argparse
import json
import os
import sys
import time

# The axon sitecustomize dials the TPU relay inside `import jax`; when the
# relay is wedged (observed 2026-08-17/18: jax.devices() hung for >12h) the
# import never returns and the driver's bench invocation records nothing.
# Emit an explicit error JSON instead of hanging forever. SIGALRM fires only
# if the import stalls; a healthy import (2-40s) cancels it.
_WATCHDOG = os.environ.get("BENCH_WATCHDOG", "1") != "0"
_watchdog_timer = None


def _arm(stage: str, secs: int) -> None:
    """(Re)start the stall watchdog. A THREAD, not SIGALRM: the wedge sits
    inside a blocking C call (the axon relay dial never returns), so a Python
    signal handler would never get to run — only another thread can still
    print the error JSON and exit."""
    global _watchdog_timer
    if not _WATCHDOG:
        return
    if _watchdog_timer is not None:
        _watchdog_timer.cancel()
        _watchdog_timer = None
    if secs <= 0:
        return

    def _stalled():
        print(json.dumps({
            "metric": "halfcheetah_env_steps_per_sec_per_chip", "value": 0,
            "unit": "steps/sec/chip", "vs_baseline": 0.0,
            "error": f"bench stalled during {stage} (TPU relay wedged)",
        }), flush=True)
        os._exit(3)

    import threading

    _watchdog_timer = threading.Timer(secs, _stalled)
    _watchdog_timer.daemon = True
    _watchdog_timer.start()


_arm("jax import", int(os.environ.get("BENCH_WATCHDOG_SECS", "300")))

import jax
import jax.numpy as jnp

_arm("", 0)


def _force(out):
    """Force REAL completion via host transfer of one scalar.

    On the axon remote-TPU platform ``block_until_ready`` returns at enqueue
    time, so timings without a transfer measure dispatch, not execution.
    """
    leaf = jax.tree.leaves(out)[-1]
    return float(jnp.asarray(leaf).reshape(-1)[0])


def _time(fn, *args, iters=3):
    _force(fn(*args))  # compile + warmup
    t0 = time.perf_counter()
    for _ in range(iters):
        out = fn(*args)
        _force(out)
    return (time.perf_counter() - t0) / iters


def bench_env_steps(n_envs: int, t: int, env_name: str = "half_cheetah") -> float:
    from cadm_tpu.envs import make

    env = make(env_name)
    states = jax.vmap(env.reset)(jax.random.split(jax.random.key(0), n_envs))

    @jax.jit
    def rollout(states, rng):
        def body(s, k):
            a = jax.random.uniform(
                k, (n_envs, env.act_dim), minval=-1.0, maxval=1.0
            )
            s, obs, r, d = jax.vmap(env.step)(s, a)
            return s, r
        final, rs = jax.lax.scan(body, states, jax.random.split(rng, t))
        return final, rs.sum()

    dt = _time(rollout, states, jax.random.key(1))
    return n_envs * t / dt


def bench_cem(n_envs: int, n_candidates: int, horizon: int) -> float:
    from cadm_tpu.envs import make
    from cadm_tpu.models.dynamics import Dynamics, DynamicsConfig
    from cadm_tpu.planners.mpc import MPCPlanner, PlannerConfig

    env = make("half_cheetah")
    model = Dynamics(
        DynamicsConfig(
            obs_dim=env.obs_dim, act_dim=env.act_dim,
            hidden=(200, 200, 200, 200), n_members=5, probabilistic=True,
            context="encoder", z_dim=10, history_k=10, future_m=10,
        )
    )
    cem_iters = 5
    planner = MPCPlanner(
        PlannerConfig(
            kind="cem", horizon=horizon, n_candidates=n_candidates,
            cem_iters=cem_iters, cem_elites=max(10, n_candidates // 10),
        ),
        model, env.reward, env.act_dim,
    )
    state = model.init_state(jax.random.key(0))
    obs = jnp.zeros((n_envs, env.obs_dim))
    z = jnp.zeros((n_envs, model.cfg.z_dim))
    act = jax.jit(lambda o, zz, k: planner.act(state, o, zz, k))
    dt = _time(act, obs, z, jax.random.key(1))
    # one "planner rollout" = one (candidate × member) H-step model rollout
    rollouts = n_envs * n_candidates * cem_iters * model.cfg.n_members
    return rollouts / dt


def bench_train_steps(batch: int, updates: int) -> float:
    from cadm_tpu.envs import make
    from cadm_tpu.models.dynamics import Dynamics, DynamicsConfig
    from cadm_tpu.train.buffer import ReplayBuffer

    env = make("half_cheetah")
    model = Dynamics(
        DynamicsConfig(
            obs_dim=env.obs_dim, act_dim=env.act_dim,
            hidden=(200, 200, 200, 200), n_members=5, probabilistic=True,
            context="encoder", z_dim=10, history_k=10, future_m=10,
        )
    )
    state = model.init_state(jax.random.key(0))
    buf = ReplayBuffer.create(64, 256, env.obs_dim, env.act_dim)
    rng = jax.random.key(1)
    obs = jax.random.normal(rng, (64, env.obs_dim))
    for t in range(256):
        buf = buf.append(
            obs, jnp.zeros((64, env.act_dim)), obs,
            jnp.zeros((64,), bool), jnp.full((64,), t % 100, jnp.int32),
        )

    @jax.jit
    def fit(state, rng):
        def upd(st, k):
            b = buf.sample_segments(
                k, (model.cfg.n_members, batch), model.cfg.history_k,
                model.cfg.future_m,
            )
            st, m = model.update(st, b)
            return st, m["model_loss"]
        st, losses = jax.lax.scan(
            upd, state, jax.random.split(rng, updates)
        )
        return st, losses

    dt = _time(fit, state, jax.random.key(2))
    return updates / dt


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--smoke", action="store_true")
    args = ap.parse_args()

    # The chip can also wedge after a clean import — in fact the observed
    # 2026-08-18 wedge hangs at first DEVICE USE, not import (sitecustomize
    # pre-imports jax, so the script's import is a no-op). Budget the whole
    # measured run.
    _arm("benchmark run", int(os.environ.get("BENCH_RUN_WATCHDOG_SECS", "1800")))

    if args.smoke:
        n_envs, t = 64, 20
        cem_envs, cands, horizon = 8, 32, 5
        batch, updates = 32, 5
    else:
        n_envs, t = 4096, 100
        cem_envs, cands, horizon = 256, 200, 30
        batch, updates = 256, 50

    steps_per_sec = bench_env_steps(n_envs, t)
    # secondary: 23-DOF SlimHumanoid with 29 contact points — the
    # contact-solver stress case (VERDICT r1 item 7 asks this be recorded).
    # Skipped off-TPU: the XLA *CPU* compile of the 23-DOF rigid scan alone
    # takes minutes, which would break the CPU-safe --smoke contract.
    on_tpu = jax.devices()[0].platform != "cpu"
    humanoid_steps = (
        bench_env_steps(max(n_envs // 2, 8), t, "slim_humanoid")
        if on_tpu
        else 0.0
    )
    cem_per_sec = bench_cem(cem_envs, cands, horizon)
    train_per_sec = bench_train_steps(batch, updates)

    print(
        f"[bench] env_steps/sec={steps_per_sec:,.0f}  "
        f"humanoid_steps/sec={humanoid_steps:,.0f}  "
        f"cem_rollouts/sec={cem_per_sec:,.0f}  "
        f"model_train_steps/sec={train_per_sec:,.1f}  "
        f"(n_envs={n_envs}, device={jax.devices()[0].platform})",
        file=sys.stderr,
    )
    # Target is ≥1M steps/s on v5e-8 (BASELINE.md); this benchmark runs on a
    # single chip of a data-parallel workload, so compare against the
    # per-chip share of that target (1M/8 = 125k steps/s/chip).
    per_chip_target = 1_000_000 / 8
    _arm("done", 0)
    print(
        json.dumps(
            {
                "metric": "halfcheetah_env_steps_per_sec_per_chip",
                "value": round(steps_per_sec),
                "unit": "steps/sec/chip",
                "vs_baseline": round(steps_per_sec / per_chip_target, 4),
                "secondary": {
                    "cem_model_rollouts_per_sec": round(cem_per_sec),
                    "dynamics_train_steps_per_sec": round(train_per_sec, 1),
                    "slim_humanoid_env_steps_per_sec": round(humanoid_steps),
                    "target": "1e6 env steps/s on v5e-8 = 125k/chip",
                },
            }
        )
    )


if __name__ == "__main__":
    main()
