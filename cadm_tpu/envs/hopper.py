"""Hopper with per-episode randomized mass & damping scales.

Reference semantics (SURVEY.md §2.1 "Env: Hopper", arXiv:2005.06800 §5.1).
Observation [qpos[1:], clip(qvel, ±10)] (11,); reward = forward velocity +
alive bonus − 0.001·‖a‖², all from observations (vx at index 5). Standard
healthy termination (height/pitch), switchable off for fixed-horizon MPC
experiments.
"""
from __future__ import annotations

import jax
import jax.numpy as jnp

from cadm_tpu.core.types import Array, PyTree
from cadm_tpu.envs.rigid_base import RigidEnv, RigidPhys


class HopperEnv(RigidEnv):
    asset = "hopper.xml"
    frame_skip = 4
    horizon = 500
    obs_dim = 11

    alive_bonus = 1.0
    ctrl_cost = 1e-3
    terminate_unhealthy = True
    _vx_index = 5

    def init_phys(self, rng: Array, params: PyTree) -> RigidPhys:
        r_q, r_v = jax.random.split(rng)
        nq, nv = self.sys.nq, self.sys.nv
        qpos = jnp.asarray(self.sys.default_qpos()) + jax.random.uniform(
            r_q, (nq,), minval=-5e-3, maxval=5e-3
        )
        qvel = jax.random.uniform(r_v, (nv,), minval=-5e-3, maxval=5e-3)
        return RigidPhys(qpos=qpos, qvel=qvel)

    def observe(self, params: PyTree, phys: RigidPhys) -> Array:
        return jnp.concatenate(
            [phys.qpos[1:], jnp.clip(phys.qvel, -10.0, 10.0)]
        )

    def reward(self, obs: Array, act: Array, next_obs: Array) -> Array:
        """vx + healthy-gated alive bonus − ctrl cost, obs-only.

        The alive bonus applies only while the state is healthy (same
        predicate as termination, computable from observations): the planner
        scores MODEL-predicted futures with this function and has no notion
        of episode termination, so an ungated bonus pays +1/step even after
        a predicted crash — CEM then happily dives forward and real episodes
        end in ~20 steps. Gating makes predicted falls unprofitable (the
        standard MBRL done-penalty, expressed as bonus withdrawal to keep
        the gym reward scale). For real steps this only changes the single
        terminal step's reward (the episode ends at the first unhealthy
        state anyway).
        """
        vx = next_obs[..., self._vx_index]
        if self.terminate_unhealthy:
            z, pitch = next_obs[..., 0], next_obs[..., 1]
            healthy = ((z > 0.7) & (jnp.abs(pitch) < 0.2)).astype(vx.dtype)
        else:
            # MBBL fixed-horizon protocol: no termination, so the bonus is
            # the reference's unconditional +1/step (a constant the planner
            # correctly ignores)
            healthy = 1.0
        return (
            vx
            + self.alive_bonus * healthy
            - self.ctrl_cost * jnp.sum(act**2, axis=-1)
        )

    def terminated(self, params: PyTree, phys: RigidPhys, obs: Array) -> Array:
        if not self.terminate_unhealthy:
            return jnp.asarray(False)
        z, pitch = phys.qpos[1], phys.qpos[2]
        healthy = (
            (z > 0.7)
            & (jnp.abs(pitch) < 0.2)
            & jnp.all(jnp.abs(obs[1:]) < 100.0)
        )
        return ~healthy
