"""Ant (mass/damping randomized) and CrippledAnt (hidden crippled leg).

Reference semantics (SURVEY.md §2.1 "Env: Ant + CrippledAnt", arXiv:2005.06800
§5.1): gym ant model. AntEnv hides per-episode mass/damping scales; the
Cripple variant zeroes the two actuators of one randomly chosen leg per
episode — the crippled-leg id IS the hidden context the CaDM encoder must
infer. Train mode cripples legs {0,1,2}; moderate/extreme hold out leg 3
(the paper's extrapolation protocol shape).

Observation [qpos[2:], qvel] (27,) — x/y translation excluded; root linear
velocity (world frame) at indices 13..15, so the reward vx = obs[13] is a
pure function of observations.
"""
from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np
from flax import struct

from cadm_tpu.core.types import Array, PyTree
from cadm_tpu.envs.rigid_base import RigidEnv, RigidPhys
from cadm_tpu.physics.rigid import dynamics as rdyn

# gym ant's init keyframe (legs bent into their joint ranges)
ANT_INIT_QPOS = np.array(
    [0, 0, 0.55, 1, 0, 0, 0, 0, 1.0, 0, -1.0, 0, -1.0, 0, 1.0]
)
# actuator indices per leg, following the asset's actuator order
# (hip_4, ankle_4, hip_1, ankle_1, hip_2, ankle_2, hip_3, ankle_3)
LEG_ACTUATORS = np.array([[2, 3], [4, 5], [6, 7], [0, 1]])


class AntEnv(RigidEnv):
    asset = "ant.xml"
    frame_skip = 5
    horizon = 1000
    obs_dim = 27

    ctrl_cost = 0.005
    survive_bonus = 0.05
    _vx_index = 13

    def init_phys(self, rng: Array, params: PyTree) -> RigidPhys:
        r_q, r_v = jax.random.split(rng)
        nq, nv = self.sys.nq, self.sys.nv
        qpos = jnp.asarray(ANT_INIT_QPOS) + jax.random.uniform(
            r_q, (nq,), minval=-0.1, maxval=0.1
        )
        quat = qpos[3:7] / jnp.linalg.norm(qpos[3:7])
        qpos = qpos.at[3:7].set(quat)
        qvel = 0.1 * jax.random.normal(r_v, (nv,))
        return RigidPhys(qpos=qpos, qvel=qvel)

    def observe(self, params: PyTree, phys: RigidPhys) -> Array:
        return jnp.concatenate([phys.qpos[2:], phys.qvel])

    def reward(self, obs: Array, act: Array, next_obs: Array) -> Array:
        vx = next_obs[..., self._vx_index]
        return (
            vx
            - self.ctrl_cost * jnp.sum(act**2, axis=-1)
            + self.survive_bonus
        )


@struct.dataclass
class CrippleParams:
    """Hidden context: which leg is disabled (as a per-actuator mask)."""

    act_mask: Array  # (nu,)


class CrippleAntEnv(AntEnv):
    """Ant with one leg's actuators zeroed per episode (hidden context)."""

    def sample_params(self, rng: Array, mode: int) -> CrippleParams:
        if mode == 0:
            leg = jax.random.randint(rng, (), 0, 3)   # train legs {0,1,2}
        else:
            leg = jnp.asarray(3)                       # held-out leg
        masks = 1.0 - jax.nn.one_hot(
            jnp.asarray(LEG_ACTUATORS)[leg], self.sys.nu
        ).sum(axis=0)
        return CrippleParams(act_mask=masks)

    def rigid_params(self, params: CrippleParams) -> rdyn.RigidParams:
        return rdyn.RigidParams(
            mass_scale=jnp.ones(()),
            damping_scale=jnp.ones(()),
            act_mask=params.act_mask,
        )
