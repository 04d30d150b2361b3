"""Core pytree types shared across the framework.

Everything is a pure, vmappable pytree (flax.struct dataclasses). Per-env
randomized dynamics parameters (``DynParams`` leaves) are *data*, never static
arguments — so a batch of envs, each with its own hidden physics, runs under a
single jitted program with no recompilation (SURVEY.md §7 "hard parts" #3).
"""
from __future__ import annotations

from typing import Any

import jax
import jax.numpy as jnp
from flax import struct

Array = jax.Array
PyTree = Any


@struct.dataclass
class EnvState:
    """Full per-env state threaded through the collect scan.

    Attributes:
      phys:   env-family-specific physical state pytree (e.g. qpos/qvel).
      obs:    current observation (obs_dim,).
      params: hidden per-episode dynamics parameters (a DynParams pytree);
              re-sampled on every reset — the context CaDM must infer.
      t:      step index within the current episode (int32 scalar).
      rng:    per-env PRNG key (consumed/split on resets).
      done:   whether the *previous* step terminated the episode.
    """

    phys: PyTree
    obs: Array
    params: PyTree
    t: Array
    rng: Array
    done: Array


@struct.dataclass
class History:
    """Fixed-size ring of the K most recent transitions for CaDM context.

    Stores (delta_obs, action) pairs — the context-encoder input of the CaDM
    paper (arXiv:2005.06800 §3.1): the latent z is produced from the past K
    state-differences and actions of the *current* trajectory.

    Implemented as a shift-register (roll + write at the end) rather than a
    pointer-indexed ring: K is tiny (~10), the shift is a cheap fused VPU op,
    and it keeps the window contiguous in time-order so the encoder can
    consume it without gather.

    Attributes:
      obs:   (K, obs_dim) past observations (transition starts), oldest
             first — consumed by gradient-adaptation models (GrBAL).
      dobs:  (K, obs_dim) past observation differences, oldest first.
      act:   (K, act_dim) past actions, oldest first.
      valid: (K,) 1.0 where the slot holds a real transition (post-reset
             slots are zero-padded and masked).
      rnn_h: (H,) episode-recurrent encoder hidden state (ReBAL): carried
             across the WHOLE trajectory, updated once per env step by
             Dynamics.push_history, wiped (with the rest of the ring) on
             reset. H = 0 for non-recurrent models.
    """

    obs: Array
    dobs: Array
    act: Array
    valid: Array
    rnn_h: Array

    @staticmethod
    def zeros(
        k: int, obs_dim: int, act_dim: int, dtype=jnp.float32, rnn_hidden: int = 0
    ) -> "History":
        return History(
            obs=jnp.zeros((k, obs_dim), dtype),
            dobs=jnp.zeros((k, obs_dim), dtype),
            act=jnp.zeros((k, act_dim), dtype),
            valid=jnp.zeros((k,), dtype),
            rnn_h=jnp.zeros((rnn_hidden,), dtype),
        )

    def push(self, obs: Array, dobs: Array, act: Array) -> "History":
        """Window-only push; recurrent state is advanced by the model's
        push_history (which knows the encoder params)."""
        return History(
            obs=jnp.roll(self.obs, -1, axis=0).at[-1].set(obs),
            dobs=jnp.roll(self.dobs, -1, axis=0).at[-1].set(dobs),
            act=jnp.roll(self.act, -1, axis=0).at[-1].set(act),
            valid=jnp.roll(self.valid, -1, axis=0).at[-1].set(1.0),
            rnn_h=self.rnn_h,
        )

    def reset(self) -> "History":
        return jax.tree.map(jnp.zeros_like, self)

    def flat(self) -> Array:
        """Masked, flattened (K*(obs_dim+act_dim),) encoder input."""
        v = self.valid[:, None]
        return jnp.concatenate(
            [(self.dobs * v).reshape(-1), (self.act * v).reshape(-1)]
        )


def batched_history(model_cfg, n_envs: int) -> "History":
    """A (n_envs,)-batched zero History sized for a model's config.

    Recurrent-context models (ReBAL, context='rnn') get an ``rnn_h`` slot of
    ``model_cfg.rnn_hidden``; everyone else gets a zero-width slot.
    """
    rh = (
        model_cfg.rnn_hidden
        if getattr(model_cfg, "context", "") == "rnn"
        else 0
    )
    return jax.vmap(
        lambda _: History.zeros(
            model_cfg.history_k, model_cfg.obs_dim, model_cfg.act_dim,
            rnn_hidden=rh,
        )
    )(jnp.arange(n_envs))


@struct.dataclass
class Transition:
    """One environment transition (leaves may carry leading batch/time axes)."""

    obs: Array
    act: Array
    next_obs: Array
    reward: Array
    done: Array


def tree_where(pred: Array, on_true: PyTree, on_false: PyTree) -> PyTree:
    """Broadcasted jnp.where over matching pytrees (pred is a scalar bool)."""
    return jax.tree.map(
        lambda a, b: jnp.where(_expand(pred, a), a, b), on_true, on_false
    )


def _expand(pred: Array, like: Array) -> Array:
    p = jnp.asarray(pred)
    while p.ndim < like.ndim:
        p = p[..., None]
    return p
