"""Unified context-aware dynamics-model family.

One implementation covers the reference's whole model zoo (SURVEY.md §2.1):

- **Vanilla** (``dynamics/mlp_dynamics.py``): ``n_members=1, probabilistic=
  False, context='none'`` — a single deterministic MLP predicting Δobs.
- **Stacked** baseline (paper §5): ``context='stacked'`` — raw past-K window
  concatenated into the model input, no encoder.
- **PE-TS ensemble** (``dynamics/mlp_dynamics_ensemble.py``): ``n_members=5,
  probabilistic=True`` — mean+logvar heads, Gaussian NLL, learned-but-bounded
  logvars and bootstrap minibatches per member (PETS conventions).
- **CaDM** (the contribution, arXiv:2005.06800 §3): ``context='encoder'`` —
  a shared context encoder maps the past-K (Δobs, action) window to latent z;
  member-stacked forward heads predict Δobs over the next M future steps with
  the SAME z, and a backward head predicts the previous observation; joint
  loss L_fwd + β·L_bwd (paper eq. 2–4).
- **CaDM + PE-TS**: encoder + probabilistic ensemble together.

TPU design: members are a leading axis vmapped over raw-pytree MLPs (batched
matmuls on the MXU — no python loop over members); normalization stats are
explicit state recomputed from the replay buffer each fit (the reference's
running-stats contract, SURVEY §3.3); everything is pure and jit-safe.
"""
from __future__ import annotations

import dataclasses
from typing import Optional, Tuple

import jax
import jax.numpy as jnp
import optax
from flax import struct

from cadm_tpu.core.types import Array, PyTree
from cadm_tpu.models.nets import gru_apply, gru_init, mlp_apply, mlp_init

# Semantics marker for the probabilistic-member loss, recorded into every
# matrix cell JSON so mixed-loss cells in RESULTS.md stay distinguishable
# (rounds 2-4 recorded three regimes under identical-looking configs:
# pure NLL -> additive NLL+MSE anchor -> decoupled stop-gradient). Bump on
# any change to head_nll's semantics.
LOSS_VARIANT = "decoupled-sg-v1"


@dataclasses.dataclass(frozen=True)
class DynamicsConfig:
    obs_dim: int
    act_dim: int
    hidden: Tuple[int, ...] = (200, 200, 200, 200)
    n_members: int = 1
    probabilistic: bool = False
    context: str = "none"  # 'none' | 'stacked' | 'encoder' | 'rnn'
    z_dim: int = 10
    rnn_hidden: int = 64
    history_k: int = 10
    future_m: int = 10
    encoder_hidden: Tuple[int, ...] = (256, 128)
    backward: bool = True          # train the backward head (CaDM only)
    beta_backward: float = 0.5     # β in L_fwd + β·L_bwd
    lr: float = 1e-3
    grad_clip: float = 10.0
    logvar_penalty: float = 0.01   # PETS bound-tightness penalty
    # Decoupled mean/variance training for probabilistic members
    # (mean_anchor > 0): the loss becomes
    #   mean_anchor · Σ_dims (f_mean − target)²            (means: pure MSE)
    #   + Σ_dims [(sg(f_mean) − target)²·e^{−lv} + lv]     (variance: NLL
    #                                                       around FROZEN means)
    # Rationale: the planner rolls out the MEANS, and at research data
    # scales the joint Gaussian NLL trains them badly in two ways (round-4
    # mini-cell decomposition, notebooks/r4_cpu_minicells.md): the variance
    # head absorbs residual error (inv_var → 0 kills the mean gradient),
    # and per-dim inv_var reweighting lets near-deterministic dims (inv_var
    # ~e^7) dominate the shared trunk, starving the hard contact dims. A
    # simple additive anchor (NLL + MSE, this round's first attempt) fixed
    # cartpole but was gradient-swamped on cripple_ant (fwd MSE stuck at
    # 0.34 vs 0.08 for pure MSE) — hence the stop_gradient decoupling:
    # means get exactly the MSE gradient (bootstrap deadlock impossible),
    # logvars stay calibrated to the actual residuals, TS sampling and the
    # PETS bound penalty are unchanged. mean_anchor = 0 restores the pure
    # joint PETS NLL. Deviation documented in PARITY.md (reference:
    # SURVEY.md §2.1 "Ensemble / PE-TS").
    mean_anchor: float = 1.0
    # Detach the logvar half of the final layer from the trunk (opt-in,
    # r5): even with the decoupled loss, NLL gradients flow through the
    # logvar columns into EVERY trunk weight the means depend on. Both
    # cheetah PE-TS+CaDM seeds degraded mid-run with the NLL and the
    # forward-mean MSE crashing TOGETHER (valid loss −80 → −12, MSE
    # 0.025 → 0.33) while the deterministic-ensemble control — identical
    # mean objective, zero NLL gradient anywhere — kept improving, which
    # implicates a variance-gradient surge through the shared trunk. With
    # this flag the logvar path reads stop_gradient(trunk features): means
    # train exactly like the deterministic control; only the final-layer
    # logvar columns (+ the PETS bound params) calibrate the variances.
    detach_logvar_trunk: bool = False

    @property
    def hist_dim(self) -> int:
        return self.history_k * (self.obs_dim + self.act_dim)

    @property
    def context_dim(self) -> int:
        if self.context in ("encoder", "rnn"):
            return self.z_dim
        if self.context == "stacked":
            return self.hist_dim
        return 0

    @property
    def head_in_dim(self) -> int:
        return self.obs_dim + self.act_dim + self.context_dim

    @property
    def head_out_dim(self) -> int:
        return self.obs_dim * (2 if self.probabilistic else 1)


@struct.dataclass
class NormStats:
    obs_mean: Array
    obs_std: Array
    act_mean: Array
    act_std: Array
    dobs_mean: Array
    dobs_std: Array

    @staticmethod
    def identity(obs_dim: int, act_dim: int) -> "NormStats":
        return NormStats(
            obs_mean=jnp.zeros((obs_dim,)),
            obs_std=jnp.ones((obs_dim,)),
            act_mean=jnp.zeros((act_dim,)),
            act_std=jnp.ones((act_dim,)),
            dobs_mean=jnp.zeros((obs_dim,)),
            dobs_std=jnp.ones((obs_dim,)),
        )


@struct.dataclass
class DynamicsState:
    params: PyTree
    opt_state: PyTree
    norm: NormStats
    updates: Array


@struct.dataclass
class SegmentBatch:
    """A training minibatch of trajectory segments (SURVEY §3.3).

    History window (K transitions before t) feeds the context path; the M
    future transitions share that context in the loss (paper eq. 2–4).
    Leaves may carry extra leading axes (e.g. a member axis for bootstrap).
    """

    hist_obs: Array    # (..., K, obs_dim) — used by meta-models (GrBAL)
    hist_dobs: Array   # (..., K, obs_dim)
    hist_act: Array    # (..., K, act_dim)
    hist_valid: Array  # (..., K)
    obs: Array         # (..., M, obs_dim)
    act: Array         # (..., M, act_dim)
    next_obs: Array    # (..., M, obs_dim)
    valid: Array       # (..., M)


class Dynamics:
    """Functional dynamics-model API shared by planners and trainers."""

    def __init__(self, config: DynamicsConfig):
        self.cfg = config
        self.tx = optax.chain(
            optax.clip_by_global_norm(config.grad_clip),
            optax.adam(config.lr),
        )

    # ------------------------------------------------------------- init --
    def init_params(self, rng: Array) -> PyTree:
        c = self.cfg
        r_enc, r_fwd, r_bwd = jax.random.split(rng, 3)
        params = {}
        if c.context == "encoder":
            params["encoder"] = mlp_init(
                r_enc, [c.hist_dim, *c.encoder_hidden, c.z_dim]
            )
        elif c.context == "rnn":
            # ReBAL recurrent context (SURVEY.md §2.1 "RNN dynamics"): a GRU
            # over (Δobs, action) pairs whose hidden state projects to z.
            # TRAINING runs the GRU over sampled K-windows from h0 = 0
            # (truncated BPTT, the learning_to_adapt convention); ACTING is
            # episode-recurrent — push_history advances a hidden state
            # carried in History.rnn_h across the whole trajectory (reset on
            # done), and the planner consumes its projection as z.
            r_gru, r_proj = jax.random.split(r_enc)
            params["encoder"] = {
                "gru": gru_init(
                    r_gru, c.obs_dim + c.act_dim, c.rnn_hidden
                ),
                "proj": mlp_init(r_proj, [c.rnn_hidden, c.z_dim]),
            }
        head_sizes = [c.head_in_dim, *c.hidden, c.head_out_dim]
        params["fwd"] = jax.vmap(lambda k: mlp_init(k, head_sizes))(
            jax.random.split(r_fwd, c.n_members)
        )
        if c.context in ("encoder", "rnn") and c.backward:
            params["bwd"] = jax.vmap(lambda k: mlp_init(k, head_sizes))(
                jax.random.split(r_bwd, c.n_members)
            )
        if c.probabilistic:
            params["max_logvar"] = jnp.full((c.obs_dim,), 0.5)
            params["min_logvar"] = jnp.full((c.obs_dim,), -10.0)
        return params

    def init_state(self, rng: Array) -> DynamicsState:
        params = self.init_params(rng)
        return DynamicsState(
            params=params,
            opt_state=self.tx.init(params),
            norm=NormStats.identity(self.cfg.obs_dim, self.cfg.act_dim),
            updates=jnp.zeros((), jnp.int32),
        )

    # ---------------------------------------------------------- context --
    def context_from_history(self, params: PyTree, norm: NormStats, hists):
        """Model-agnostic context hook: consume a (batched) History pytree.

        Planners treat the result as an opaque per-env context — an array
        here; gradient-adaptation models (GrBAL) return adapted parameter
        pytrees instead. For ``context='rnn'`` (ReBAL) the context is the
        projection of the EPISODE-recurrent hidden state carried in
        ``History.rnn_h`` — not a re-encoding of the K-window.
        """
        if self.cfg.context == "rnn":
            return mlp_apply(params["encoder"]["proj"], hists.rnn_h)
        return self.get_context(
            params, norm, hists.dobs, hists.act, hists.valid
        )

    def push_history(
        self, params: PyTree, norm: NormStats, hists, obs, dobs, act
    ):
        """Advance (batched) histories by one transition.

        Pushes the window ring and, for recurrent contexts, one GRU step on
        the carried hidden state using the current encoder params/norm.
        Callers wipe the returned History (including rnn_h) on done.
        """
        pushed = jax.vmap(type(hists).push)(hists, obs, dobs, act)
        if self.cfg.context != "rnn":
            return pushed
        nd = (dobs - norm.dobs_mean) / norm.dobs_std
        na = (act - norm.act_mean) / norm.act_std
        x = jnp.concatenate([nd, na], axis=-1)
        h = gru_apply(params["encoder"]["gru"], hists.rnn_h, x)
        return dataclasses.replace(pushed, rnn_h=h)

    def get_context(
        self,
        params: PyTree,
        norm: NormStats,
        hist_dobs: Array,
        hist_act: Array,
        hist_valid: Array,
    ) -> Array:
        """Latent context from the past-K window. Shape (..., context_dim).

        For ``context='none'`` returns a zero-width array so downstream
        concatenation is shape-polymorphic without branching.
        """
        c = self.cfg
        nd = (hist_dobs - norm.dobs_mean) / norm.dobs_std
        na = (hist_act - norm.act_mean) / norm.act_std
        v = hist_valid[..., None]
        flat = jnp.concatenate(
            [
                (nd * v).reshape(*hist_dobs.shape[:-2], -1),
                (na * v).reshape(*hist_act.shape[:-2], -1),
            ],
            axis=-1,
        )
        if c.context == "encoder":
            return mlp_apply(params["encoder"], flat)
        if c.context == "rnn":
            x = jnp.concatenate([nd * v, na * v], axis=-1)   # (..., K, d)
            xs = jnp.moveaxis(x, -2, 0)                      # (K, ..., d)
            vs = jnp.moveaxis(hist_valid, -1, 0)             # (K, ...)
            h0 = jnp.zeros((*x.shape[:-2], c.rnn_hidden))

            def cell(h, xv):
                xt, vt = xv
                h_new = gru_apply(params["encoder"]["gru"], h, xt)
                h = jnp.where(vt[..., None] > 0, h_new, h)
                return h, None

            h, _ = jax.lax.scan(cell, h0, (xs, vs))
            return mlp_apply(params["encoder"]["proj"], h)
        if c.context == "stacked":
            return flat
        return flat[..., :0]

    # ---------------------------------------------------------- predict --
    def _head_out(
        self, head_params: PyTree, params: PyTree, norm: NormStats,
        x_in: Array, act: Array, z: Array,
    ) -> Tuple[Array, Optional[Array]]:
        """Normalized-delta prediction (mean, logvar|None) from one head."""
        c = self.cfg
        nx = (x_in - norm.obs_mean) / norm.obs_std
        na = (act - norm.act_mean) / norm.act_std
        inp = jnp.concatenate([nx, na, z], axis=-1)
        if c.probabilistic and c.detach_logvar_trunk:
            # value-identical to the fused apply; gradient-blocked on the
            # logvar -> trunk path (see DynamicsConfig.detach_logvar_trunk)
            from cadm_tpu.models.nets import swish

            feats = inp
            for layer in head_params[:-1]:
                feats = swish(
                    jnp.dot(feats, layer["w"],
                            preferred_element_type=jnp.float32) + layer["b"]
                )
            last = head_params[-1]
            d = last["w"].shape[-1] // 2
            mean = jnp.dot(
                feats, last["w"][:, :d],
                preferred_element_type=jnp.float32,
            ) + last["b"][:d]
            logvar = jnp.dot(
                jax.lax.stop_gradient(feats), last["w"][:, d:],
                preferred_element_type=jnp.float32,
            ) + last["b"][d:]
            out = None
        else:
            out = mlp_apply(head_params, inp)
        if not c.probabilistic:
            return out, None
        if out is not None:
            mean, logvar = jnp.split(out, 2, axis=-1)
        # PETS soft bounds: keep logvar inside learned [min, max].
        logvar = params["max_logvar"] - jax.nn.softplus(
            params["max_logvar"] - logvar
        )
        logvar = params["min_logvar"] + jax.nn.softplus(
            logvar - params["min_logvar"]
        )
        return mean, logvar

    def predict(
        self,
        params: PyTree,
        norm: NormStats,
        member_fwd: PyTree,
        obs: Array,
        act: Array,
        z: Array,
        rng: Optional[Array] = None,
    ) -> Array:
        """Next-obs prediction through ONE member's forward head.

        ``member_fwd`` is one slice of ``params['fwd']`` (callers vmap over
        the member axis for TS-ensemble propagation). With ``rng`` and a
        probabilistic model, samples from the predicted Gaussian (TS∞);
        otherwise returns the mean.
        """
        mean, logvar = self._head_out(member_fwd, params, norm, obs, act, z)
        if logvar is not None and rng is not None:
            mean = mean + jnp.exp(0.5 * logvar) * jax.random.normal(
                rng, mean.shape
            )
        dobs = norm.dobs_mean + norm.dobs_std * mean
        return obs + dobs

    # ------------------------------------------------------------- loss --
    def _nll(self, mean: Array, logvar: Optional[Array], target: Array) -> Array:
        if logvar is None:
            return jnp.sum((mean - target) ** 2, axis=-1)
        inv_var = jnp.exp(-logvar)
        return jnp.sum((mean - target) ** 2 * inv_var + logvar, axis=-1)

    def loss(
        self, params: PyTree, norm: NormStats, batch: SegmentBatch
    ) -> Tuple[Array, dict]:
        """Joint CaDM loss over member-indexed segment batches.

        ``batch`` leaves have shape (n_members, B, ...). The context z is
        computed once per segment and shared across all M future steps
        (paper eq. 2: the window τ_{t-K:t-1} conditions predictions at
        t..t+M-1). Backward head predicts the previous observation via the
        negated normalized delta (paper eq. 3).
        """
        c = self.cfg

        def member_loss(fwd_p, bwd_p, mb: SegmentBatch):
            z = self.get_context(
                params, norm, mb.hist_dobs, mb.hist_act, mb.hist_valid
            )  # (B, ctx)
            z_m = jnp.broadcast_to(
                z[:, None, :], (*mb.obs.shape[:-1], z.shape[-1])
            )
            target = (mb.next_obs - mb.obs - norm.dobs_mean) / norm.dobs_std
            f_mean, f_logvar = self._head_out(
                fwd_p, params, norm, mb.obs, mb.act, z_m
            )
            decouple = c.probabilistic and c.mean_anchor > 0.0

            def head_nll(mean, logvar, tgt):
                if not decouple:
                    return self._nll(mean, logvar, tgt)
                return c.mean_anchor * jnp.sum(
                    (mean - tgt) ** 2, axis=-1
                ) + self._nll(jax.lax.stop_gradient(mean), logvar, tgt)

            per_step = head_nll(f_mean, f_logvar, target)  # (B, M)
            if bwd_p is not None:
                b_mean, b_logvar = self._head_out(
                    bwd_p, params, norm, mb.next_obs, mb.act, z_m
                )
                per_step = per_step + c.beta_backward * head_nll(
                    b_mean, b_logvar, -target
                )
            w = mb.valid / (jnp.sum(mb.valid) + 1e-8)
            # normalized forward-MEAN error, NLL-free: for probabilistic
            # models the NLL can keep improving while the means the planner
            # rolls out get worse (variance shrinks) — this metric is the
            # planner-relevant model quality
            mse = jnp.sum(jnp.mean((f_mean - target) ** 2, axis=-1) * w)
            return jnp.sum(per_step * w), mse

        bwd = params.get("bwd")
        if bwd is not None:
            losses, mses = jax.vmap(member_loss)(params["fwd"], bwd, batch)
        else:
            losses, mses = jax.vmap(lambda f, mb: member_loss(f, None, mb))(
                params["fwd"], batch
            )
        total = jnp.mean(losses)
        metrics = {"model_loss": total, "fwd_mean_mse": jnp.mean(mses)}
        if c.probabilistic:
            bound_pen = c.logvar_penalty * (
                jnp.sum(params["max_logvar"]) - jnp.sum(params["min_logvar"])
            )
            total = total + bound_pen
            metrics["logvar_bound_penalty"] = bound_pen
        return total, metrics

    # ----------------------------------------------------------- update --
    def update(
        self, state: DynamicsState, batch: SegmentBatch
    ) -> Tuple[DynamicsState, dict]:
        """One Adam step on a member-indexed minibatch (jit/scan-safe)."""
        (loss, metrics), grads = jax.value_and_grad(self.loss, has_aux=True)(
            state.params, state.norm, batch
        )
        updates, opt_state = self.tx.update(grads, state.opt_state, state.params)
        params = optax.apply_updates(state.params, updates)
        return (
            DynamicsState(
                params=params,
                opt_state=opt_state,
                norm=state.norm,
                updates=state.updates + 1,
            ),
            metrics,
        )
