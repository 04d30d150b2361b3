"""Property tests for the ant 4-fold leg-symmetry maps (envs/ant.py).

The augmentation's entire validity rests on exact equivariance of the REAL
simulator: T_k(step(s, a; cripple L)) == step(T_k(s), T_k(a); cripple
(L+k)%4). If the asset or the maps were even slightly asymmetric these
tests fail, so they gate the `leg_aug` training variant.
"""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from cadm_tpu.envs.ant import (
    CrippleAntEnv,
    LEG_ACTUATORS,
    leg_symmetry_maps,
)
from cadm_tpu.envs.rigid_base import RigidPhys


@pytest.fixture(scope="module")
def env():
    return CrippleAntEnv()


@pytest.fixture(scope="module")
def maps():
    return leg_symmetry_maps()


def _mask_for_leg(env, leg: int) -> jnp.ndarray:
    m = np.ones(env.sys.nu)
    m[LEG_ACTUATORS[leg]] = 0.0
    return jnp.asarray(m)


def _random_phys(env, key, n):
    """Plausible mid-episode states: randomized inits stepped a few times
    (so several legs are in ground contact)."""
    k1, k2 = jax.random.split(key)
    params = type("P", (), {})  # only act_mask is read via rigid_params
    from cadm_tpu.envs.ant import CrippleParams

    p = CrippleParams(act_mask=jnp.ones(env.sys.nu))
    phys = jax.vmap(lambda k: env.init_phys(k, p))(jax.random.split(k1, n))
    acts = jax.random.uniform(k2, (3, n, env.sys.nu), minval=-1, maxval=1)

    step = jax.jit(jax.vmap(lambda ph, a: env.step_phys(CrippleParams(
        act_mask=jnp.ones(env.sys.nu)), ph, a)))
    for t in range(3):
        phys = step(phys, acts[t])
    return phys


def test_maps_are_signed_permutations_and_cyclic(maps):
    for name in ("act",):
        for k in range(4):
            m = maps[name][k]
            assert np.allclose(np.abs(m) @ np.abs(m).T, np.eye(m.shape[0]))
    # act/qvel are genuine period-4 signed permutations; obs/qpos contain
    # the quaternion block, whose 90° right-multiplication has period 8
    # (double cover: r^4 = -1, and -q is the same physical rotation)
    for name, period in (("act", 4), ("qvel", 4), ("obs", 8), ("qpos", 8)):
        m1 = maps[name][1]
        assert np.allclose(np.linalg.matrix_power(m1, period),
                           np.eye(m1.shape[0]), atol=1e-12), name


def test_obs_map_matches_phys_map(env, maps):
    from cadm_tpu.envs.ant import CrippleParams

    phys = _random_phys(env, jax.random.key(0), 8)
    p = CrippleParams(act_mask=jnp.ones(env.sys.nu))
    obs = jax.vmap(lambda ph: env.observe(p, ph))(phys)
    # transforms applied in float64: jnp's f32 matmul on this backend
    # accumulates at ~1e-3 relative (bf16-grade), which would swamp the
    # equivariance signal (measured: a 15-dim f32 matmul off by 3.7e-3)
    for k in range(4):
        tq = np.asarray(phys.qpos, np.float64) @ maps["qpos"][k].T
        tv = np.asarray(phys.qvel, np.float64) @ maps["qvel"][k].T
        tobs = jax.vmap(lambda q, v: env.observe(
            p, RigidPhys(qpos=q, qvel=v)))(
                jnp.asarray(tq, jnp.float32), jnp.asarray(tv, jnp.float32))
        want = np.asarray(obs, np.float64) @ maps["obs"][k].T
        assert np.allclose(np.asarray(tobs), want, atol=1e-5)


def test_reward_invariance(env, maps):
    key = jax.random.key(1)
    obs = jax.random.normal(key, (16, 27))
    act = jax.random.uniform(jax.random.key(2), (16, 8), minval=-1, maxval=1)
    nobs = jax.random.normal(jax.random.key(3), (16, 27))
    r0 = env.reward(obs, act, nobs)
    for k in range(1, 4):
        rk = env.reward(
            jnp.asarray(np.asarray(obs, np.float64) @ maps["obs"][k].T,
                        jnp.float32),
            jnp.asarray(np.asarray(act, np.float64) @ maps["act"][k].T,
                        jnp.float32),
            jnp.asarray(np.asarray(nobs, np.float64) @ maps["obs"][k].T,
                        jnp.float32))
        assert np.allclose(np.asarray(rk), np.asarray(r0), atol=1e-5)


@pytest.mark.parametrize("converged", [True, False])
def test_step_equivariance_all_rotations(env, maps, converged):
    """The load-bearing property: transformed transitions ARE transitions
    of the relabeled-cripple env, through the full contact dynamics.

    PGS is a sequential Gauss–Seidel sweep, so its UNconverged iterate
    depends on contact enumeration order — which the leg relabeling
    permutes. At the production iteration count (15/6) the equivariance
    gap therefore equals the solver's own convergence gap (~2e-2 qvel on
    contact-rich states); at 8x iterations it collapses to float32 noise
    (measured 3e-7/9e-6), proving the maps themselves are exact. Both
    regimes are asserted: strict at converged iters, solver-noise bound at
    production iters."""
    import dataclasses

    from cadm_tpu.envs.ant import CrippleAntEnv, CrippleParams

    if converged:
        env = CrippleAntEnv()
        env.sys = dataclasses.replace(
            env.sys, solver_iters=env.sys.solver_iters * 8,
            solver_iters_warm=env.sys.solver_iters_warm * 8)
        tol_q, tol_v = 1e-5, 1e-4
    else:
        tol_q, tol_v = 2e-3, 1e-1

    n = 16
    phys = _random_phys(env, jax.random.key(4), n)
    act = jax.random.uniform(jax.random.key(5), (n, env.sys.nu),
                             minval=-1, maxval=1)

    step = jax.jit(jax.vmap(
        lambda ph, a, m: env.step_phys(CrippleParams(act_mask=m), ph, a),
        in_axes=(0, 0, None)))
    for leg in range(4):
        out = step(phys, act, _mask_for_leg(env, leg))
        qpos64 = np.asarray(phys.qpos, np.float64)
        qvel64 = np.asarray(phys.qvel, np.float64)
        act64 = np.asarray(act, np.float64)
        for k in range(1, 4):
            t_phys = RigidPhys(
                qpos=jnp.asarray(qpos64 @ maps["qpos"][k].T, jnp.float32),
                qvel=jnp.asarray(qvel64 @ maps["qvel"][k].T, jnp.float32))
            t_act = jnp.asarray(act64 @ maps["act"][k].T, jnp.float32)
            out_t = step(t_phys, t_act, _mask_for_leg(env, (leg + k) % 4))
            want_q = np.asarray(out.qpos, np.float64) @ maps["qpos"][k].T
            want_v = np.asarray(out.qvel, np.float64) @ maps["qvel"][k].T
            err_q = np.abs(np.asarray(out_t.qpos) - want_q).max()
            err_v = np.abs(np.asarray(out_t.qvel) - want_v).max()
            assert err_q < tol_q and err_v < tol_v, (leg, k, err_q, err_v)


def test_symmetrize_stats_matches_empirical(maps):
    """_symmetrize_stats must equal the moments of explicitly augmented
    data (uniform mixture over group elements)."""
    from cadm_tpu.train.mb_trainer import _symmetrize_stats

    rng = np.random.RandomState(0)
    x = rng.randn(4096, 27) * rng.uniform(0.5, 2.0, 27) + rng.uniform(
        -1, 1, 27)
    aug = np.concatenate([x @ maps["obs"][k].T for k in range(4)], axis=0)
    mean = jnp.asarray(x.mean(axis=0), jnp.float32)
    std = jnp.asarray(x.std(axis=0), jnp.float32)
    m_s, s_s = _symmetrize_stats(jnp.asarray(maps["obs"], jnp.float32),
                                 mean, std)
    assert np.allclose(np.asarray(m_s), aug.mean(axis=0), atol=1e-4)
    assert np.allclose(np.asarray(s_s), aug.std(axis=0), atol=1e-3)


def test_trainer_augmented_fit_smoke():
    """End-to-end: a cripple_ant trainer with symmetry_aug samples
    augmented train batches and fits with finite losses; envs without
    maps reject the flag."""
    import jax

    from cadm_tpu.cli.presets import ExperimentConfig

    with pytest.raises(ValueError):
        ExperimentConfig(
            env="cartpole", model="cadm", symmetry_aug=True,
            fit_protocol="epochs",
        ).build()

    cfg = ExperimentConfig(
        env="cripple_ant", model="cadm", ensemble=2, symmetry_aug=True,
        n_envs=2, steps_per_itr=30, n_itr=1, buffer_capacity=64,
        batch_size=16, eval_envs=2, fit_protocol="epochs", max_epochs=2,
        model_updates_per_itr=4, epoch_updates_cap=4, planner="rs",
        n_candidates=8, plan_horizon=5, history_k=4, future_m=3,
    )
    env, model, planner, trainer = cfg.build()
    rng = jax.random.key(0)
    env_states, hists, buffer, _ = trainer.init(rng)
    env_states, hists, buffer, _ = trainer._collect_random(
        jax.random.key(1), env_states, hists, buffer, trainer.init_dyn(rng)
    ) if hasattr(trainer, "init_dyn") else trainer._collect_random(
        jax.random.key(1), env_states, hists, buffer,
        model.init_state(jax.random.key(2)),
    )
    st = model.init_state(jax.random.key(3))
    st = trainer._refresh_norm(buffer, st)
    batch = trainer._sample(buffer, jax.random.key(4), "train")
    loss, metrics = model.loss(st.params, st.norm, batch)
    assert np.isfinite(float(loss))
    # identity element must be a no-op
    raw = buffer.sample_segments(jax.random.key(5), (2, 16), 4, 3,
                                 split="train")
    same = trainer._augment(raw, jax.random.key(6))
    assert raw.obs.shape == same.obs.shape
