"""Environment API: pure, vmappable, randomized-dynamics gym-equivalent.

Mirrors the reference's env contract (SURVEY.md §1 L1, §3.5) with TPU-native
semantics:

- ``reset`` samples fresh hidden ``DynParams`` per episode (the context CaDM
  must infer) and returns an initial state — the reference does this inside
  ``reset()`` of each ``*/envs/*_env.py`` [SURVEY §2.1].
- ``step`` is a pure function of (state, action); auto-reset on done happens
  inside ``step`` (with a fresh param draw) so an entire rollout is one
  ``lax.scan`` with no host control flow.
- ``reward(obs, act, next_obs)`` is a PURE BATCHED function of observations
  only — the planner scores *model-predicted* states with it (SURVEY §3.5
  "correctness-critical" invariant).

Subclasses implement the five primitive hooks; this base class composes them
into reset/step. Env instances hold only static python config (shapes, ranges)
— they are safe to close over inside jit.
"""
from __future__ import annotations

import dataclasses
from typing import Tuple

import jax
import jax.numpy as jnp

from cadm_tpu.core.types import Array, EnvState, PyTree, tree_where


class Env:
    """Base class for randomized-dynamics environments."""

    # --- static interface every env family defines -------------------------
    obs_dim: int
    act_dim: int
    horizon: int
    dt: float

    # Parameter randomization modes, matching the paper's train / moderate /
    # extreme dynamics-shift ranges (arXiv:2005.06800 §5.1).
    TRAIN, MODERATE, EXTREME = 0, 1, 2

    def __init__(
        self,
        randomization: str = "discrete",
        terminate_unhealthy: "bool | None" = None,
        horizon: "int | None" = None,
    ):
        """``randomization`` picks the hidden-param sampling scheme:
        "discrete" = the paper's per-mode scale sets (default),
        "continuous" = round 1's uniform extrapolation bands (ablation).

        ``terminate_unhealthy``/``horizon`` override the family defaults —
        the MBBL benchmark protocol (Wang et al. 2019, the reference env
        lineage: SURVEY.md §2.1) REMOVES early termination and runs every
        episode a fixed 1000 steps, so hopper/slim_humanoid paper returns
        come from full-length episodes. ``terminate_unhealthy=False,
        horizon=1000`` reproduces that; the family defaults keep gym-style
        healthy termination (with the alive bonus healthy-gated so the
        planner prices predicted falls).
        """
        self.randomization = randomization
        if terminate_unhealthy is not None:
            self.terminate_unhealthy = terminate_unhealthy
        if horizon is not None:
            self.horizon = horizon

    # --- primitive hooks ----------------------------------------------------
    def sample_params(self, rng: Array, mode: int) -> PyTree:
        """Draw hidden per-episode dynamics parameters."""
        raise NotImplementedError

    def init_phys(self, rng: Array, params: PyTree) -> PyTree:
        """Initial physical state (with the env's usual small state noise)."""
        raise NotImplementedError

    def observe(self, params: PyTree, phys: PyTree) -> Array:
        raise NotImplementedError

    def step_phys(self, params: PyTree, phys: PyTree, action: Array) -> PyTree:
        """One control step (frame_skip substeps inside, pure)."""
        raise NotImplementedError

    def reward(self, obs: Array, act: Array, next_obs: Array) -> Array:
        """Batched reward from observations only (planner-compatible)."""
        raise NotImplementedError

    def terminated(self, params: PyTree, phys: PyTree, obs: Array) -> Array:
        """Early-termination predicate (False for most families)."""
        return jnp.asarray(False)

    def symmetry_maps(self):
        """Exact symmetry group of the dynamics+reward, for training-time
        data augmentation (TrainerConfig.symmetry_aug).

        None (default) = no known symmetry. Families with one return
        {'obs': (G, obs_dim, obs_dim), 'act': (G, act_dim, act_dim)} such
        that element k maps valid transitions onto valid transitions of the
        k-relabeled hidden params with the same reward (CrippleAnt: 4-fold
        leg relabeling, tests/test_ant_symmetry.py)."""
        return None

    # Healthy-magnitude bounds for TRAINING data. The stability guard ends a
    # blown-up episode, but the transition that crosses the threshold (and
    # its immediate ramp) still lands in the replay buffer with |qvel| in
    # the hundreds — a handful of such rows inflate the Δobs normalization
    # std by orders of magnitude, silently flattening the normalized loss
    # and wrecking the planner's real-space model accuracy (observed as the
    # cripple_ant itr-5 collapse in round 2). Transitions beyond these
    # bounds are stored with bad=True and masked out of norm stats, the fit
    # loss, and encoder history windows. inf = disabled (analytic envs).
    bad_obs_limit: float = float("inf")
    bad_dobs_limit: float = float("inf")

    def bad_transition(self, obs: Array, next_obs: Array) -> Array:
        """True for transitions too large to be healthy training data."""
        o = jnp.abs(next_obs).max(axis=-1)
        d = jnp.abs(next_obs - obs).max(axis=-1)
        return (o > self.bad_obs_limit) | (d > self.bad_dobs_limit)

    def unstable(self, phys: PyTree) -> Array:
        """Physics-stability guard: True ends the episode (auto-reset).

        The TPU-native analogue of MuJoCo's BADQACC/autoreset behavior: an
        exploding or non-finite state terminates the episode instead of
        streaming garbage into the replay buffer (a single NaN transition
        NaN-poisons the dynamics fit, after which planner scores go NaN and
        every env behaves identically — observed on the ant family in the
        round-2 result matrix before this guard existed).
        """
        return jnp.asarray(False)

    def action_limits(self) -> Tuple[Array, Array]:
        return (-jnp.ones((self.act_dim,)), jnp.ones((self.act_dim,)))

    # --- composed API -------------------------------------------------------
    def reset(self, rng: Array, mode: int = 0) -> EnvState:
        r_params, r_phys, r_next = jax.random.split(rng, 3)
        params = self.sample_params(r_params, mode)
        phys = self.init_phys(r_phys, params)
        obs = self.observe(params, phys)
        return EnvState(
            phys=phys,
            obs=obs,
            params=params,
            t=jnp.zeros((), jnp.int32),
            rng=r_next,
            done=jnp.zeros((), bool),
        )

    def step(self, state: EnvState, action: Array, mode: int = 0) -> Tuple[EnvState, Array, Array, Array]:
        """Pure step with built-in auto-reset.

        Returns (next_state, obs_before_autoreset, reward, done). ``done`` is
        raised at the episode horizon or on early termination; when it fires,
        ``next_state`` is already a freshly reset episode with NEW hidden
        params (the reference's vectorized executor auto-reset, SURVEY §2.1
        "Vectorized env executor").
        """
        low, high = self.action_limits()
        action = jnp.clip(action, low, high)
        phys = self.step_phys(state.params, state.phys, action)
        obs = self.observe(state.params, phys)
        # sanitize BEFORE reward/storage: the blown-up step still emits one
        # finite (clamped) transition, then `unstable` ends the episode
        obs = jnp.clip(jnp.nan_to_num(obs, nan=0.0), -1e4, 1e4)
        reward = jnp.nan_to_num(self.reward(state.obs, action, obs), nan=0.0)
        t = state.t + 1
        done = (
            (t >= self.horizon)
            | self.terminated(state.params, phys, obs)
            | self.unstable(phys)
        )
        stepped = dataclasses.replace(
            state, phys=phys, obs=obs, t=t, done=done
        )
        fresh = self.reset(state.rng, mode)
        next_state = tree_where(done, fresh, stepped)
        # Keep done flag visible to the caller even after auto-reset.
        next_state = dataclasses.replace(next_state, done=done)
        return next_state, obs, reward, done
