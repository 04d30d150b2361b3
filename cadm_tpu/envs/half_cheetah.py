"""HalfCheetah with per-episode randomized mass & damping scales.

Reference semantics (SURVEY.md §2.1 "Env: HalfCheetah", arXiv:2005.06800
§5.1): gym half-cheetah model, per-episode multiplicative scales on body
masses and joint damping, batched reward = forward velocity − 0.05·‖a‖²
computable from observations alone (the planner scores predicted states with
it, SURVEY §3.5).

Observation layout [qpos[1:], qvel] (17,) — excludes the root x position
(translation-invariant dynamics) and includes the root x velocity at index 8,
which the reward reads. Control cost coefficient 0.05 follows the reference
lineage (learning_to_adapt-style cheetah; gym proper uses 0.1) — flagged for
recalibration once the reference mount is readable.
"""
from __future__ import annotations

import jax
import jax.numpy as jnp

from cadm_tpu.core.types import Array, PyTree
from cadm_tpu.envs.rigid_base import RigidEnv, RigidPhys


class HalfCheetahEnv(RigidEnv):
    asset = "half_cheetah.xml"
    frame_skip = 5
    horizon = 1000
    obs_dim = 17

    ctrl_cost = 0.05
    _vx_index = 8  # qvel[0] position within obs

    def init_phys(self, rng: Array, params: PyTree) -> RigidPhys:
        r_q, r_v = jax.random.split(rng)
        nq, nv = self.sys.nq, self.sys.nv
        qpos = jnp.asarray(self.sys.default_qpos()) + jax.random.uniform(
            r_q, (nq,), minval=-0.1, maxval=0.1
        )
        qvel = 0.1 * jax.random.normal(r_v, (nv,))
        return RigidPhys(qpos=qpos, qvel=qvel)

    def observe(self, params: PyTree, phys: RigidPhys) -> Array:
        return jnp.concatenate([phys.qpos[1:], phys.qvel])

    def reward(self, obs: Array, act: Array, next_obs: Array) -> Array:
        vx = next_obs[..., self._vx_index]
        return vx - self.ctrl_cost * jnp.sum(act**2, axis=-1)
