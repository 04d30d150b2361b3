"""SlimHumanoid with per-episode randomized mass & damping scales.

Reference semantics (SURVEY.md §2.1 "Env: SlimHumanoid", arXiv:2005.06800
§5.1): gym humanoid model with the SLIM observation — qpos+qvel only, none of
gym's cinert/cvel/cfrc blocks — and mass/damping randomization. Reward =
alive bonus + forward-velocity term − quadratic control cost, computed from
observations (vx at index 22 is the root world x velocity).
"""
from __future__ import annotations

import jax
import jax.numpy as jnp

from cadm_tpu.core.types import Array, PyTree
from cadm_tpu.envs.rigid_base import RigidEnv, RigidPhys


class SlimHumanoidEnv(RigidEnv):
    asset = "slim_humanoid.xml"
    frame_skip = 5
    horizon = 500
    obs_dim = 45

    alive_bonus = 5.0
    vel_weight = 1.25
    ctrl_cost = 0.1
    terminate_unhealthy = True
    _vx_index = 22

    def init_phys(self, rng: Array, params: PyTree) -> RigidPhys:
        r_q, r_v = jax.random.split(rng)
        nq, nv = self.sys.nq, self.sys.nv
        qpos = jnp.asarray(self.sys.default_qpos()) + jax.random.uniform(
            r_q, (nq,), minval=-0.01, maxval=0.01
        )
        quat = qpos[3:7] / jnp.linalg.norm(qpos[3:7])
        qpos = qpos.at[3:7].set(quat)
        qvel = jax.random.uniform(r_v, (nv,), minval=-0.01, maxval=0.01)
        return RigidPhys(qpos=qpos, qvel=qvel)

    def observe(self, params: PyTree, phys: RigidPhys) -> Array:
        return jnp.concatenate([phys.qpos[2:], phys.qvel])

    def reward(self, obs: Array, act: Array, next_obs: Array) -> Array:
        """Healthy-gated alive bonus + velocity − ctrl cost, obs-only.

        The alive bonus applies only while the torso height is in the healthy
        band (the same predicate as termination, computable from the
        observation: obs[0] is qpos[2]). Same rationale as HopperEnv.reward —
        the planner scores MODEL-predicted futures with this function and an
        ungated +5/step bonus makes predicted falls free, so CEM never learns
        to stay upright (round-2 matrix: all humanoid variants flat at ~130 ≈
        26 surviving steps). For real steps only the single terminal step's
        reward changes.
        """
        vx = next_obs[..., self._vx_index]
        if self.terminate_unhealthy:
            z = next_obs[..., 0]
            healthy = ((z > 1.0) & (z < 2.0)).astype(vx.dtype)
        else:
            # MBBL fixed-horizon protocol: unconditional +5/step, as in the
            # reference lineage's slim humanoid (done = False)
            healthy = 1.0
        return (
            self.alive_bonus * healthy
            + self.vel_weight * vx
            - self.ctrl_cost * jnp.sum(act**2, axis=-1)
        )

    def terminated(self, params: PyTree, phys: RigidPhys, obs: Array) -> Array:
        if not self.terminate_unhealthy:
            return jnp.asarray(False)
        z = phys.qpos[2]
        return (z < 1.0) | (z > 2.0)
