"""Env wrappers: observation/action normalization (SURVEY.md §2.1
"Env wrapper": the reference's ``normalized_env.py`` / ``normalize()``).

``NormalizedEnv`` rescales actions from the canonical [-1, 1] box onto the
wrapped env's native limits and optionally maintains running observation
statistics (kept inside ``EnvState.phys`` as explicit state so the wrapper
stays pure/vmappable — no hidden host-side accumulators like the reference).
"""
from __future__ import annotations

from typing import Tuple

import jax.numpy as jnp
from flax import struct

from cadm_tpu.core.types import Array, PyTree
from cadm_tpu.envs.base import Env


@struct.dataclass
class ObsStats:
    mean: Array
    var: Array
    count: Array

    @staticmethod
    def init(obs_dim: int) -> "ObsStats":
        return ObsStats(
            mean=jnp.zeros((obs_dim,)),
            var=jnp.ones((obs_dim,)),
            count=jnp.asarray(1e-4),
        )

    def update(self, obs: Array) -> "ObsStats":
        # Welford-style streaming update (one sample)
        count = self.count + 1.0
        delta = obs - self.mean
        mean = self.mean + delta / count
        var = self.var + (delta * (obs - mean) - self.var) / count
        return ObsStats(mean=mean, var=var, count=count)


@struct.dataclass
class NormalizedPhys:
    inner: PyTree
    stats: ObsStats


class NormalizedEnv(Env):
    """Wraps an Env: [-1,1] action box + optional running obs whitening."""

    def __init__(self, env: Env, normalize_obs: bool = False, clip_obs: float = 10.0):
        self.env = env
        self.normalize_obs = normalize_obs
        self.clip_obs = clip_obs
        self.obs_dim = env.obs_dim
        self.act_dim = env.act_dim
        self.horizon = env.horizon
        self.dt = env.dt
        self.randomization = getattr(env, "randomization", "discrete")

    def sample_params(self, rng, mode):
        return self.env.sample_params(rng, mode)

    def init_phys(self, rng, params):
        return NormalizedPhys(
            inner=self.env.init_phys(rng, params),
            stats=ObsStats.init(self.env.obs_dim),
        )

    def observe(self, params, phys: NormalizedPhys):
        obs = self.env.observe(params, phys.inner)
        if not self.normalize_obs:
            return obs
        white = (obs - phys.stats.mean) / jnp.sqrt(phys.stats.var + 1e-8)
        return jnp.clip(white, -self.clip_obs, self.clip_obs)

    def step_phys(self, params, phys: NormalizedPhys, action):
        lo, hi = self.env.action_limits()
        native = lo + 0.5 * (action + 1.0) * (hi - lo)
        inner = self.env.step_phys(params, phys.inner, native)
        stats = phys.stats
        if self.normalize_obs:
            stats = stats.update(self.env.observe(params, inner))
        return NormalizedPhys(inner=inner, stats=stats)

    def bad_transition(self, obs, next_obs):
        # Delegate to the wrapped env's magnitude limits (ADVICE r3 medium:
        # inheriting Env's inf limits silently disabled the blowup masking
        # whenever normalize_env=True). With normalize_obs the whitened obs
        # are clipped at clip_obs << any family's raw limit, so delegation is
        # only meaningful in the raw-obs (action-rescaling-only) mode — which
        # is the mode the trainers use.
        return self.env.bad_transition(obs, next_obs)

    def reward(self, obs, act, next_obs):
        # NOTE: with normalize_obs the planner invariant requires rewards on
        # RAW observations — so the wrapper's reward contract only supports
        # the action-rescaling mode unless the inner reward is whitening-
        # invariant. Mirrors the reference, which normalizes actions only
        # for the MPC experiments.
        return self.env.reward(obs, act, next_obs)

    def terminated(self, params, phys: NormalizedPhys, obs):
        return self.env.terminated(params, phys.inner, obs)

    def action_limits(self) -> Tuple[Array, Array]:
        return (-jnp.ones((self.act_dim,)), jnp.ones((self.act_dim,)))
