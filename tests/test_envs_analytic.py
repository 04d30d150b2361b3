"""Unit tests for the analytic-tier envs (SURVEY.md §4.2).

CartPole and Pendulum have closed-form dynamics; we check the exact ODE
update, randomization-mode band structure, auto-reset semantics, and that
everything jits and vmaps with per-env hidden params as data.
"""
import dataclasses

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from cadm_tpu.envs.cartpole import CartPoleEnv
from cadm_tpu.envs.pendulum import PendulumEnv


@pytest.fixture(params=["cartpole", "pendulum"])
def env(request):
    return {"cartpole": CartPoleEnv, "pendulum": PendulumEnv}[request.param]()


def test_reset_step_shapes(env):
    state = env.reset(jax.random.key(0))
    assert state.obs.shape == (env.obs_dim,)
    action = jnp.zeros((env.act_dim,))
    next_state, obs, reward, done = env.step(state, action)
    assert obs.shape == (env.obs_dim,)
    assert reward.shape == ()
    assert not bool(done)


def test_params_resampled_per_episode(env):
    """Hidden dynamics params must change across episodes (CaDM premise)."""
    s0 = env.reset(jax.random.key(0))
    s1 = env.reset(jax.random.key(1))
    leaves0 = jax.tree.leaves(s0.params)
    leaves1 = jax.tree.leaves(s1.params)
    assert any(
        not np.allclose(a, b) for a, b in zip(leaves0, leaves1)
    )


def test_mode_bands_exclude_train_range(env):
    """Moderate/extreme draws must land outside the training interval."""
    keys = jax.random.split(jax.random.key(0), 200)
    train = jax.vmap(lambda k: env.sample_params(k, 0))(keys)
    extreme = jax.vmap(lambda k: env.sample_params(k, 2))(keys)
    for leaf_t, leaf_e in zip(jax.tree.leaves(train), jax.tree.leaves(extreme)):
        lo, hi = float(leaf_t.min()), float(leaf_t.max())
        inside = (np.asarray(leaf_e) >= lo) & (np.asarray(leaf_e) <= hi)
        assert not inside.any()


def test_autoreset_at_horizon(env):
    """Stepping past the horizon auto-resets with fresh params inside scan."""
    state = env.reset(jax.random.key(0))
    old_params = state.params

    def body(s, _):
        s, obs, r, d = env.step(s, jnp.zeros((env.act_dim,)))
        return s, d

    final, dones = jax.lax.scan(body, state, None, length=env.horizon + 5)
    assert bool(dones[env.horizon - 1])  # fired exactly at the horizon
    assert int(dones.sum()) == 1
    assert int(final.t) == 5
    # fresh episode drew new hidden params
    assert any(
        not np.allclose(a, b)
        for a, b in zip(jax.tree.leaves(old_params), jax.tree.leaves(final.params))
    )


def test_vmap_heterogeneous_params(env):
    """A batch of envs each with different hidden params under one jit."""
    n = 32
    keys = jax.random.split(jax.random.key(0), n)
    states = jax.vmap(env.reset)(keys)
    actions = jnp.zeros((n, env.act_dim))

    @jax.jit
    def step_all(s, a):
        return jax.vmap(env.step)(s, a)

    next_states, obs, rewards, dones = step_all(states, actions)
    assert obs.shape == (n, env.obs_dim)
    assert rewards.shape == (n,)
    # different hidden params ⇒ different next observations from same action
    assert np.unique(np.asarray(obs), axis=0).shape[0] > 1


def test_cartpole_ode_exact():
    """Check the cart-pole ODE against a hand-computed Euler update."""
    env = CartPoleEnv()
    state = env.reset(jax.random.key(0))
    p, ph = state.params, state.phys
    a = jnp.array([0.3])
    nxt = env.step_phys(p, ph, a)
    # hand recompute
    F = float(p.force_mag) * 0.3
    mc, mp, g, l = env.mass_cart, env.mass_pole, env.gravity, float(p.length)
    th, thd = float(ph.theta), float(ph.theta_dot)
    temp = (F + mp * l * thd**2 * np.sin(th)) / (mc + mp)
    thacc = (g * np.sin(th) - np.cos(th) * temp) / (
        l * (4 / 3 - mp * np.cos(th) ** 2 / (mc + mp))
    )
    xacc = temp - mp * l * thacc * np.cos(th) / (mc + mp)
    xd = float(ph.x_dot) + env.dt * xacc
    np.testing.assert_allclose(float(nxt.x_dot), xd, rtol=1e-5)
    np.testing.assert_allclose(
        float(nxt.x), float(ph.x) + env.dt * xd, rtol=1e-5
    )


def test_pendulum_reward_matches_gym_form():
    env = PendulumEnv()
    theta, theta_dot, a = 0.7, -1.2, 0.5
    obs = jnp.array([np.cos(theta), np.sin(theta), theta_dot])
    r = float(env.reward(jnp.zeros(3), jnp.array([a]), obs))
    expected = -(theta**2 + 0.1 * theta_dot**2 + 0.001 * (2.0 * a) ** 2)
    np.testing.assert_allclose(r, expected, rtol=1e-5)
