"""GrBAL-style gradient-based adaptive dynamics model (meta-learning baseline).

Reference lineage (SURVEY.md §2.1 "Meta/GrBAL baseline": presence in the CaDM
repo unconfirmed, but the codebase family descends from learning_to_adapt's
GrBAL, and the paper compares against it — arXiv:1803.11347): a dynamics MLP
whose parameters are adapted ONLINE by taking gradient steps on the most
recent K transitions, MAML-style; meta-training optimizes post-adaptation
prediction on the next M transitions.

TPU design: the inner adaptation is ``jax.grad`` through the same
explicit-pytree MLP as the rest of the zoo; meta-gradients flow through the
inner step via ordinary autodiff (no second framework needed). Everything is
pure and vmapped over segments — each segment adapts its own fast weights in
parallel (the reference adapts serially per trajectory on CPU).
"""
from __future__ import annotations

import dataclasses
from typing import Tuple

import jax
import jax.numpy as jnp
import optax
from flax import struct

from cadm_tpu.core.types import Array, PyTree
from cadm_tpu.models.dynamics import NormStats, SegmentBatch
from cadm_tpu.models.nets import mlp_apply, mlp_init


@dataclasses.dataclass(frozen=True)
class GrBALConfig:
    obs_dim: int
    act_dim: int
    hidden: Tuple[int, ...] = (200, 200, 200)
    history_k: int = 10
    future_m: int = 10
    inner_lr: float = 0.01
    inner_steps: int = 1
    lr: float = 1e-3
    grad_clip: float = 10.0
    n_members: int = 1  # API parity with DynamicsConfig (always 1)


@struct.dataclass
class GrBALState:
    params: PyTree
    opt_state: PyTree
    norm: NormStats
    updates: Array


class GrBAL:
    def __init__(self, config: GrBALConfig):
        self.cfg = config
        self.tx = optax.chain(
            optax.clip_by_global_norm(config.grad_clip),
            optax.adam(config.lr),
        )

    def init_state(self, rng: Array) -> GrBALState:
        c = self.cfg
        params = {
            "net": mlp_init(
                rng, [c.obs_dim + c.act_dim, *c.hidden, c.obs_dim]
            )
        }
        return GrBALState(
            params=params,
            opt_state=self.tx.init(params),
            norm=NormStats.identity(c.obs_dim, c.act_dim),
            updates=jnp.zeros((), jnp.int32),
        )

    # ------------------------------------------------------------- core --
    def _pred_loss(
        self, net: PyTree, norm: NormStats,
        obs: Array, act: Array, dobs: Array, valid: Array,
    ) -> Array:
        nx = (obs - norm.obs_mean) / norm.obs_std
        na = (act - norm.act_mean) / norm.act_std
        target = (dobs - norm.dobs_mean) / norm.dobs_std
        pred = mlp_apply(net, jnp.concatenate([nx, na], axis=-1))
        err = jnp.sum((pred - target) ** 2, axis=-1)
        return jnp.sum(err * valid) / (jnp.sum(valid) + 1e-8)

    def adapt(
        self, params: PyTree, norm: NormStats,
        hist_obs: Array, hist_act: Array, hist_dobs: Array, hist_valid: Array,
    ) -> PyTree:
        """Fast weights from ``inner_steps`` gradient steps on the window."""
        net = params["net"]
        for _ in range(self.cfg.inner_steps):
            g = jax.grad(self._pred_loss)(
                net, norm, hist_obs, hist_act, hist_dobs, hist_valid
            )
            net = jax.tree.map(
                lambda p, gg: p - self.cfg.inner_lr * gg, net, g
            )
        return net

    def predict(
        self, net: PyTree, norm: NormStats, obs: Array, act: Array
    ) -> Array:
        nx = (obs - norm.obs_mean) / norm.obs_std
        na = (act - norm.act_mean) / norm.act_std
        pred = mlp_apply(net, jnp.concatenate([nx, na], axis=-1))
        return obs + norm.dobs_mean + norm.dobs_std * pred

    # ------------------------------------------------------------- loss --
    def loss(self, params: PyTree, norm: NormStats, batch: SegmentBatch):
        """Meta-objective: post-adaptation error on the future window.

        ``batch`` leaves are (B, ...): every segment adapts its own fast
        weights (vmap), meta-gradient flows through the inner update.
        Member-leading trainer batches (N, B, ...) are flattened — GrBAL has
        a single meta-network.
        """
        if batch.valid.ndim == 3:
            batch = jax.tree.map(
                lambda x: x.reshape((-1,) + x.shape[2:]), batch
            )

        def per_segment(b: SegmentBatch):
            net = self.adapt(
                params, norm, b.hist_obs, b.hist_act, b.hist_dobs, b.hist_valid
            )
            dobs = b.next_obs - b.obs
            return self._pred_loss(net, norm, b.obs, b.act, dobs, b.valid)

        losses = jax.vmap(per_segment)(batch)
        return jnp.mean(losses), {"model_loss": jnp.mean(losses)}

    def push_history(self, params: PyTree, norm: NormStats, hists, obs, dobs, act):
        """Window-only history advance (no recurrent state in GrBAL)."""
        return jax.vmap(type(hists).push)(hists, obs, dobs, act)

    def context_from_history(self, params: PyTree, norm: NormStats, hists):
        """Per-env ADAPTED fast weights from the history window.

        Unlike the CaDM latent, GrBAL's "context" is a parameter pytree —
        the planner (planners.grbal_mpc.GrBALPlanner) rolls the model with
        these adapted weights (the MAML-at-test-time semantics).
        """
        return jax.vmap(
            lambda o, d, a, v: self.adapt(params, norm, o, a, d, v)
        )(hists.obs, hists.dobs, hists.act, hists.valid)

    def update(self, state: GrBALState, batch: SegmentBatch):
        # accept trainer-style member-leading batches by flattening
        if batch.valid.ndim == 3:
            batch = jax.tree.map(
                lambda x: x.reshape((-1,) + x.shape[2:]), batch
            )
        (loss, metrics), grads = jax.value_and_grad(
            lambda p: self.loss(p, state.norm, batch), has_aux=True
        )(state.params)
        updates, opt_state = self.tx.update(grads, state.opt_state, state.params)
        params = optax.apply_updates(state.params, updates)
        return (
            GrBALState(
                params=params,
                opt_state=opt_state,
                norm=state.norm,
                updates=state.updates + 1,
            ),
            metrics,
        )
