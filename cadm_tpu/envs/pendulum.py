"""Pendulum swing-up with randomized mass and length.

Semantics per the CaDM paper (arXiv:2005.06800 §5.1: "Pendulum ... we change
the mass and length of pendulum") and SURVEY.md §2.1 (reference
``envs/pendulum_env.py``: analytic θ̈ = f(m, l, g, u)).

Dynamics and reward follow the classic Pendulum-v0 formulation with per-episode
hidden (mass, length): θ̈ = 3g/(2l)·sinθ + 3/(m l²)·u, dt = 0.05, |θ̇| ≤ 8,
torque u = 2·a. Reward is computed purely from (next_obs, act):
−(θ² + 0.1·θ̇² + 0.001·u²) with θ recovered via atan2 — planner-compatible
(SURVEY §3.5).
"""
from __future__ import annotations

import jax
import jax.numpy as jnp
from flax import struct

from cadm_tpu.core.types import Array
from cadm_tpu.envs.base import Env
from cadm_tpu.envs.ranges import canonical


@struct.dataclass
class PendulumParams:
    mass: Array
    length: Array


@struct.dataclass
class PendulumPhys:
    theta: Array
    theta_dot: Array


class PendulumEnv(Env):
    obs_dim = 3
    act_dim = 1
    horizon = 200
    dt = 0.05

    gravity = 10.0
    max_torque = 2.0
    max_speed = 8.0

    # Paper protocol: mass and length drawn per episode from the canonical
    # discrete scale sets around the nominal m = l = 1.0.
    def sample_params(self, rng: Array, mode: int) -> PendulumParams:
        scale = canonical(self.randomization)
        r_m, r_l = jax.random.split(rng)
        return PendulumParams(
            mass=scale.sample(r_m, mode),
            length=scale.sample(r_l, mode),
        )

    def init_phys(self, rng: Array, params: PendulumParams) -> PendulumPhys:
        r_t, r_v = jax.random.split(rng)
        return PendulumPhys(
            theta=jax.random.uniform(r_t, (), minval=-jnp.pi, maxval=jnp.pi),
            theta_dot=jax.random.uniform(r_v, (), minval=-1.0, maxval=1.0),
        )

    def observe(self, params: PendulumParams, phys: PendulumPhys) -> Array:
        return jnp.stack(
            [jnp.cos(phys.theta), jnp.sin(phys.theta), phys.theta_dot]
        )

    def step_phys(
        self, params: PendulumParams, phys: PendulumPhys, action: Array
    ) -> PendulumPhys:
        u = self.max_torque * action[0]
        m, l, g = params.mass, params.length, self.gravity
        theta_acc = 3.0 * g / (2.0 * l) * jnp.sin(phys.theta) + 3.0 / (
            m * l**2
        ) * u
        theta_dot = jnp.clip(
            phys.theta_dot + self.dt * theta_acc, -self.max_speed, self.max_speed
        )
        return PendulumPhys(
            theta=phys.theta + self.dt * theta_dot, theta_dot=theta_dot
        )

    def reward(self, obs: Array, act: Array, next_obs: Array) -> Array:
        cos_t, sin_t = next_obs[..., 0], next_obs[..., 1]
        theta = jnp.arctan2(sin_t, cos_t)
        theta_dot = next_obs[..., 2]
        u = self.max_torque * act[..., 0]
        return -(theta**2 + 0.1 * theta_dot**2 + 0.001 * u**2)
