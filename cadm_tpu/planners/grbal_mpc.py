"""MPC planner for GrBAL: rollouts through per-env ADAPTED fast weights.

GrBAL's test-time behavior (arXiv:1803.11347; SURVEY.md §2.1 "Meta/GrBAL"):
each control step the model is adapted on the recent K transitions and the
planner rolls candidates through the adapted model. In cadm_tpu the "context"
slot of the planner API carries the adapted parameter pytree (produced by
``GrBAL.context_from_history``), so the same trainer machinery drives both
CaDM (array z) and GrBAL (pytree z) planners.
"""
from __future__ import annotations

from typing import Callable, Optional

import jax
import jax.numpy as jnp

from cadm_tpu.core.types import Array, PyTree
from cadm_tpu.models.dynamics import NormStats
from cadm_tpu.models.grbal import GrBAL
from cadm_tpu.planners.mpc import MPCPlanner, PlannerConfig, RewardFn


class GrBALPlanner(MPCPlanner):
    def __init__(
        self,
        config: PlannerConfig,
        model: GrBAL,
        reward_fn: RewardFn,
        act_dim: int,
        bad_transition_fn: Optional[Callable[[Array, Array], Array]] = None,
        obs_limit: float = float("inf"),
    ):
        self.cfg = config
        self.model = model
        self.reward_fn = reward_fn
        self.act_dim = act_dim
        import math

        self.bad_transition_fn = bad_transition_fn
        self.obs_limit = float(obs_limit)
        self._guard_on = bad_transition_fn is not None and math.isfinite(
            self.obs_limit
        )

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

        def step(carry, a_t):
            obs, alive = carry
            next_obs = self.model.predict(z, norm, obs, a_t)
            next_obs, alive, blown = self._guard(obs, next_obs, alive)
            r = (
                self.reward_fn(obs, a_t, next_obs) * alive
                - self.cfg.blowup_penalty * blown
            )
            return (next_obs, alive), r

        (_, _), rewards = jax.lax.scan(
            step, (obs, jnp.ones((c,))), jnp.swapaxes(actions, 0, 1)
        )
        return rewards.sum(axis=0)  # (C,)

    def init_plan(self, n_envs: int) -> Array:
        return jnp.zeros((n_envs, self.cfg.horizon, self.act_dim))
