"""Rigid-body env family tests: shapes, randomization, reward-from-obs,
crippled-leg masking, vmapped heterogeneous stepping."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from cadm_tpu.envs import make

FAMILIES = ["half_cheetah", "hopper", "ant", "cripple_ant", "slim_humanoid"]


@pytest.fixture(scope="module")
def envs():
    return {name: make(name) for name in FAMILIES}


@pytest.mark.parametrize("name", FAMILIES)
def test_reset_step_shapes(envs, name):
    env = envs[name]
    state = env.reset(jax.random.key(0))
    assert state.obs.shape == (env.obs_dim,)
    a = jnp.zeros((env.act_dim,))
    nxt, obs, r, d = env.step(state, a)
    assert obs.shape == (env.obs_dim,)
    assert np.isfinite(float(r))
    assert bool(jnp.isfinite(obs).all())


def test_cheetah_reward_is_pure_obs_function(envs):
    env = envs["half_cheetah"]
    obs = jnp.zeros((4, env.obs_dim))
    nxt = jnp.zeros((4, env.obs_dim)).at[:, 8].set(jnp.array([1.0, 2.0, 0.0, -1.0]))
    act = jnp.zeros((4, env.act_dim)).at[0].set(1.0)
    r = env.reward(obs, act, nxt)
    np.testing.assert_allclose(
        np.asarray(r), [1.0 - 0.05 * 6, 2.0, 0.0, -1.0], atol=1e-6
    )


def test_cheetah_mass_scale_changes_dynamics(envs):
    import dataclasses

    env = envs["half_cheetah"]
    s = env.reset(jax.random.key(0))
    light_p = dataclasses.replace(s.params, mass_scale=jnp.asarray(0.3))
    heavy_p = dataclasses.replace(s.params, mass_scale=jnp.asarray(1.7))
    a = jnp.ones((env.act_dim,)) * 0.5
    ph_l = env.step_phys(light_p, s.phys, a)
    ph_h = env.step_phys(heavy_p, s.phys, a)
    # same torque accelerates a light body more
    assert float(jnp.abs(ph_l.qvel - ph_h.qvel).max()) > 1e-3


def test_cripple_ant_leg_mask(envs):
    env = envs["cripple_ant"]
    # train mode never cripples leg 3 (actuators 0,1); eval mode always does
    keys = jax.random.split(jax.random.key(0), 64)
    train = jax.vmap(lambda k: env.sample_params(k, 0))(keys)
    masks = np.asarray(train.act_mask)
    assert (masks[:, 0] == 1.0).all() and (masks[:, 1] == 1.0).all()
    assert ((masks == 0).sum(axis=1) == 2).all()  # exactly one leg disabled
    ev = env.sample_params(jax.random.key(1), 2)
    np.testing.assert_array_equal(np.asarray(ev.act_mask)[:2], [0.0, 0.0])

    # crippled actuators produce no motion difference
    s = env.reset(jax.random.key(2))
    p = env.sample_params(jax.random.key(3), 2)  # leg 3 (acts 0,1) crippled
    a0 = jnp.zeros((env.act_dim,))
    a1 = a0.at[0].set(1.0).at[1].set(1.0)       # only crippled actuators
    ph0 = env.step_phys(p, s.phys, a0)
    ph1 = env.step_phys(p, s.phys, a1)
    np.testing.assert_allclose(
        np.asarray(ph0.qpos), np.asarray(ph1.qpos), atol=1e-6
    )


def test_vmapped_heterogeneous_cheetah(envs):
    env = envs["half_cheetah"]
    n = 16
    states = jax.vmap(env.reset)(jax.random.split(jax.random.key(0), n))

    @jax.jit
    def rollout(states, rng):
        def body(carry, k):
            s = carry
            a = jax.random.uniform(k, (n, env.act_dim), minval=-1, maxval=1)
            s, obs, r, d = jax.vmap(env.step)(s, a)
            return s, r
        keys = jax.random.split(rng, 10)
        return jax.lax.scan(body, states, keys)

    final, rewards = rollout(states, jax.random.key(1))
    assert rewards.shape == (10, n)
    assert bool(jnp.isfinite(rewards).all())
    assert bool(jnp.isfinite(final.obs).all())


def test_unstable_state_terminates_and_sanitizes():
    """Physics blowups end the episode (MuJoCo BADQACC-style auto-reset)
    and never emit non-finite observations (NaN-poisoned buffers made the
    dynamics fit NaN across the whole ant matrix row before this guard)."""
    import dataclasses

    from cadm_tpu.envs.ant import AntEnv

    env = AntEnv()
    state = env.reset(jax.random.key(0))
    # blow up the velocity state directly
    bad_phys = dataclasses.replace(
        state.phys, qvel=state.phys.qvel.at[0].set(1e6)
    )
    state = dataclasses.replace(state, phys=bad_phys)
    step = jax.jit(env.step)
    next_state, obs, reward, done = step(state, jnp.zeros((env.act_dim,)))
    assert bool(done)
    assert bool(jnp.isfinite(obs).all())
    assert bool(jnp.isfinite(reward))
    # auto-reset produced a fresh, healthy episode
    assert int(next_state.t) == 0
    assert bool(jnp.isfinite(next_state.obs).all())
    assert bool(jnp.abs(next_state.phys.qvel).max() < 1e2)

    # NaN states are likewise caught
    nan_phys = dataclasses.replace(
        state.phys, qpos=state.phys.qpos.at[2].set(jnp.nan)
    )
    state2 = dataclasses.replace(state, phys=nan_phys)
    _, obs2, _, done2 = step(state2, jnp.zeros((env.act_dim,)))
    assert bool(done2)
    assert bool(jnp.isfinite(obs2).all())


def test_hopper_alive_bonus_gated_on_health():
    """The planner scores model rollouts with env.reward and cannot see
    termination, so the alive bonus must vanish on unhealthy states
    (otherwise CEM pays +1/step after a predicted crash and real hopper
    episodes end in ~20 steps — observed in the round-2 result matrix)."""
    from cadm_tpu.envs.hopper import HopperEnv

    env = HopperEnv()
    act = jnp.zeros((env.act_dim,))
    healthy = jnp.zeros((env.obs_dim,)).at[0].set(1.2)   # z=1.2, pitch=0
    fallen = jnp.zeros((env.obs_dim,)).at[0].set(0.4)    # z=0.4
    tipped = jnp.zeros((env.obs_dim,)).at[0].set(1.2).at[1].set(0.5)
    r_h = float(env.reward(healthy, act, healthy))
    r_f = float(env.reward(healthy, act, fallen))
    r_t = float(env.reward(healthy, act, tipped))
    assert abs(r_h - env.alive_bonus) < 1e-6
    assert abs(r_f) < 1e-6 and abs(r_t) < 1e-6


def test_mbbl_fixed_horizon_protocol():
    """The MBBL protocol (reference env lineage: no early termination,
    fixed 1000-step episodes, unconditional alive bonus) is reproduced by
    terminate_unhealthy=False + horizon=1000 overrides."""
    for name, bonus in [("hopper", 1.0), ("slim_humanoid", 5.0)]:
        env = make(name, terminate_unhealthy=False, horizon=1000)
        assert env.horizon == 1000
        state = env.reset(jax.random.key(0))
        # an obviously fallen observation still earns the full alive bonus
        fallen = jnp.zeros((env.obs_dim,)).at[0].set(0.1)
        act = jnp.zeros((env.act_dim,))
        r_fallen = float(env.reward(state.obs, act, fallen))
        assert r_fallen >= bonus - 1.0, (name, r_fallen)
        # terminated() never fires on unhealthy phys under the protocol
        phys = state.phys
        low = phys.qpos.at[1 if name == "hopper" else 2].set(0.05)
        phys = type(phys)(qpos=low, qvel=phys.qvel)
        obs = env.observe(state.params, phys)
        assert not bool(env.terminated(state.params, phys, obs))
        # ... while the default (gym-style) env does terminate there
        env_t = make(name)
        assert bool(env_t.terminated(state.params, phys, obs))
        # and the default reward withholds the bonus on the fallen obs
        assert float(env_t.reward(state.obs, act, fallen)) < r_fallen - 0.5 * bonus
