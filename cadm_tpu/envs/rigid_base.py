"""Shared base for the rigid-body (former MuJoCo) env families.

Mirrors the reference's mujoco-py env contract (SURVEY.md §3.5): per-episode
hidden mass/damping scale draws applied to the model, gym-style observation
layouts, and batched observation-only rewards — but stepping is the pure-JAX
engine in ``cadm_tpu.physics.rigid`` vmapped over envs, not an external C
library.

Each concrete env declares its asset, frame_skip, obs/reward semantics, and
how hidden params are sampled. Systems are loaded once per process (host-side
MJCF parse) and closed over by the jitted step.
"""
from __future__ import annotations

import os
from functools import lru_cache

import jax
import jax.numpy as jnp
from flax import struct

from cadm_tpu.core.types import Array, PyTree
from cadm_tpu.envs.base import Env
from cadm_tpu.envs.ranges import canonical
from cadm_tpu.physics.rigid import dynamics as rdyn
from cadm_tpu.physics.rigid.mjcf import system_from_mjcf
from cadm_tpu.physics.rigid.system import System

_ASSET_DIR = os.path.join(os.path.dirname(__file__), "assets")


@lru_cache(maxsize=None)
def load_system(asset: str) -> System:
    with open(os.path.join(_ASSET_DIR, asset)) as f:
        return system_from_mjcf(f.read())


@struct.dataclass
class RigidPhys:
    qpos: Array
    qvel: Array


@struct.dataclass
class MassDampingParams:
    """Hidden per-episode scales (paper §5.1 mass/damping randomization)."""

    mass_scale: Array
    damping_scale: Array


class RigidEnv(Env):
    asset: str
    frame_skip: int

    def __init__(self, randomization: str = "discrete", **overrides):
        super().__init__(randomization, **overrides)
        self.sys = load_system(self.asset)
        self.dt = self.sys.dt * self.frame_skip
        self._scale = canonical(randomization)

    # ---- default param scheme: global mass & damping scales --------------
    # Paper protocol: per-episode mass/damping scales drawn from discrete
    # sets (train {0.75,0.85,1.0,1.15,1.25}, test sets outside the hull).
    def sample_params(self, rng: Array, mode: int) -> PyTree:
        r_m, r_d = jax.random.split(rng)
        return MassDampingParams(
            mass_scale=self._scale.sample(r_m, mode),
            damping_scale=self._scale.sample(r_d, mode),
        )

    def rigid_params(self, params: PyTree) -> rdyn.RigidParams:
        return rdyn.RigidParams(
            mass_scale=params.mass_scale,
            damping_scale=params.damping_scale,
            act_mask=jnp.ones((self.sys.nu,)),
        )

    # blowup threshold for the stability guard: healthy locomotion speeds
    # are O(10) rad/s and m/s; contact-solver blowups shoot past 1e3 within
    # a frame. Episodes whose state crosses this end early (Env.unstable).
    QVEL_BLOWUP = 1e3

    # healthy rigid-body obs magnitudes are O(10) (qvel in rad/s, m/s);
    # 10x that is junk — exclude from training (Env.bad_transition)
    bad_obs_limit = 150.0
    bad_dobs_limit = 100.0

    def unstable(self, phys: RigidPhys) -> Array:
        finite = jnp.isfinite(phys.qpos).all() & jnp.isfinite(phys.qvel).all()
        return (~finite) | (jnp.abs(phys.qvel).max() > self.QVEL_BLOWUP)

    # ---- stepping ---------------------------------------------------------
    def step_phys(self, params: PyTree, phys: RigidPhys, action: Array) -> RigidPhys:
        qpos, qvel = rdyn.step_n(
            self.sys,
            self.rigid_params(params),
            phys.qpos,
            phys.qvel,
            action,
            self.frame_skip,
        )
        return RigidPhys(qpos=qpos, qvel=qvel)

    @property
    def act_dim(self) -> int:  # type: ignore[override]
        return self.sys.nu
