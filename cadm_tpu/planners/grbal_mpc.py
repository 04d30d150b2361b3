"""MPC planner for GrBAL: rollouts through per-env ADAPTED fast weights.

GrBAL's test-time behavior (arXiv:1803.11347; SURVEY.md §2.1 "Meta/GrBAL"):
each control step the model is adapted on the recent K transitions and the
planner rolls candidates through the adapted model. In cadm_tpu the "context"
slot of the planner API carries the adapted parameter pytree (produced by
``GrBAL.context_from_history``), so the same trainer machinery drives both
CaDM (array z) and GrBAL (pytree z) planners.
"""
from __future__ import annotations

import jax
import jax.numpy as jnp

from cadm_tpu.core.types import Array, PyTree
from cadm_tpu.models.dynamics import NormStats
from cadm_tpu.models.grbal import GrBAL
from cadm_tpu.planners.mpc import MPCPlanner, PlannerConfig, RewardFn


class GrBALPlanner(MPCPlanner):
    def __init__(
        self, config: PlannerConfig, model: GrBAL, reward_fn: RewardFn, act_dim: int
    ):
        self.cfg = config
        self.model = model
        self.reward_fn = reward_fn
        self.act_dim = act_dim

    def _evaluate(
        self,
        params: PyTree,
        norm: NormStats,
        obs0: Array,
        z: PyTree,        # adapted net for THIS env
        actions: Array,   # (C, H, act_dim)
        rng: Array,
    ) -> Array:
        c = actions.shape[0]
        obs = jnp.broadcast_to(obs0, (c, obs0.shape[-1]))

        def step(obs, a_t):
            next_obs = self.model.predict(z, norm, obs, a_t)
            r = self.reward_fn(obs, a_t, next_obs)
            return next_obs, r

        _, rewards = jax.lax.scan(step, obs, jnp.swapaxes(actions, 0, 1))
        return rewards.sum(axis=0)  # (C,)

    def init_plan(self, n_envs: int) -> Array:
        return jnp.zeros((n_envs, self.cfg.horizon, self.act_dim))
