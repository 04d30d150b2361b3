"""CartPole with continuous force action and randomized push-force / pole length.

Semantics per the CaDM paper (arXiv:2005.06800 §5.1: "CartPole ... we change
the push force and pole length per episode") and SURVEY.md §2.1 (reference
``envs/cartpole_env.py``: analytic physics, numpy-only, continuous action).

Physics: the classic Barto–Sutton–Anderson cart-pole ODE (the same equations
gym's CartPole uses), semi-implicit Euler at dt=0.02, with the pole length and
force magnitude as per-episode hidden parameters.

Observation layout [x, ẋ, sinθ, cosθ, θ̇] keeps the reward a pure function of
observations (planner invariant, SURVEY §3.5): upright-pole bonus minus a
cart-displacement penalty, computed from next_obs only.
"""
from __future__ import annotations

import jax
import jax.numpy as jnp
from flax import struct

from cadm_tpu.core.types import Array
from cadm_tpu.envs.base import Env
from cadm_tpu.envs.ranges import canonical


@struct.dataclass
class CartPoleParams:
    force_mag: Array  # hidden per-episode push-force magnitude
    length: Array     # hidden per-episode pole half-length (gym convention)


@struct.dataclass
class CartPolePhys:
    x: Array
    x_dot: Array
    theta: Array
    theta_dot: Array


# Nominal gym CartPole constants scaled by the canonical per-mode sets
# (paper protocol: push force and pole length randomized per episode).
NOMINAL_FORCE = 10.0
NOMINAL_LENGTH = 0.5  # gym convention: pole half-length


class CartPoleEnv(Env):
    obs_dim = 5
    act_dim = 1
    horizon = 200
    dt = 0.02

    gravity = 9.8
    mass_cart = 1.0
    mass_pole = 0.1

    def sample_params(self, rng: Array, mode: int) -> CartPoleParams:
        scale = canonical(self.randomization)
        r_f, r_l = jax.random.split(rng)
        return CartPoleParams(
            force_mag=scale.scaled(NOMINAL_FORCE).sample(r_f, mode),
            length=scale.scaled(NOMINAL_LENGTH).sample(r_l, mode),
        )

    def init_phys(self, rng: Array, params: CartPoleParams) -> CartPolePhys:
        s = jax.random.uniform(rng, (4,), minval=-0.05, maxval=0.05)
        return CartPolePhys(x=s[0], x_dot=s[1], theta=s[2], theta_dot=s[3])

    def observe(self, params: CartPoleParams, phys: CartPolePhys) -> Array:
        return jnp.stack(
            [
                phys.x,
                phys.x_dot,
                jnp.sin(phys.theta),
                jnp.cos(phys.theta),
                phys.theta_dot,
            ]
        )

    def step_phys(
        self, params: CartPoleParams, phys: CartPolePhys, action: Array
    ) -> CartPolePhys:
        force = params.force_mag * action[0]
        total_mass = self.mass_cart + self.mass_pole
        ml = self.mass_pole * params.length
        cos_t, sin_t = jnp.cos(phys.theta), jnp.sin(phys.theta)
        temp = (force + ml * phys.theta_dot**2 * sin_t) / total_mass
        theta_acc = (self.gravity * sin_t - cos_t * temp) / (
            params.length * (4.0 / 3.0 - self.mass_pole * cos_t**2 / total_mass)
        )
        x_acc = temp - ml * theta_acc * cos_t / total_mass
        # Semi-implicit Euler: update velocities first, then positions.
        x_dot = phys.x_dot + self.dt * x_acc
        theta_dot = phys.theta_dot + self.dt * theta_acc
        return CartPolePhys(
            x=phys.x + self.dt * x_dot,
            x_dot=x_dot,
            theta=phys.theta + self.dt * theta_dot,
            theta_dot=theta_dot,
        )

    def reward(self, obs: Array, act: Array, next_obs: Array) -> Array:
        x, cos_t = next_obs[..., 0], next_obs[..., 3]
        return cos_t - 0.01 * x**2
