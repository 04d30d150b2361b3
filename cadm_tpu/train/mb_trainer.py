"""Model-based trainer: the reference's master loop, fused on-TPU.

Reference call stack (SURVEY.md §3.1–3.4): for each outer iteration —
collect rollouts with MPC-through-the-model (uniform-random actions on the
first iteration to bootstrap the dataset), aggregate into the dataset, fit
the dynamics model, evaluate on shifted dynamics ranges, log and snapshot.

TPU design: the three hot stacks collapse into TWO jitted programs per
iteration — ``collect`` (one ``lax.scan`` over time with the CEM planner,
env physics, history ring and replay-buffer append all inside; vmapped over
envs) and ``fit`` (norm-stat recompute + ``lax.scan`` over Adam updates with
rejection-free segment sampling). The python outer loop only orchestrates
and logs once per iteration (SURVEY §5 "metrics flushed once per outer itr").
"""
from __future__ import annotations

import dataclasses
from typing import Optional, Tuple

import jax
import jax.numpy as jnp

from cadm_tpu.core.types import Array, History, batched_history
from cadm_tpu.envs.base import Env
from cadm_tpu.models.dynamics import Dynamics, DynamicsState, NormStats
from cadm_tpu.planners.mpc import MPCPlanner
from cadm_tpu.train.buffer import ReplayBuffer, masked_mean_std


def _symmetrize_stats(maps: Array, mean: Array, std: Array):
    """Normalization stats of the group-augmented data distribution.

    The augmented data is the uniform mixture over group elements k of
    ``maps[k] @ x``. For signed-permutation maps (exactly one ±1 per row)
    the mixture's per-dim moments are exact:
      mean' = (1/G) Σ_k maps[k] @ mean
      E[x²]' = (1/G) Σ_k maps[k]² @ (std² + mean²)     (elementwise square)
    Without this, a dim whose sign flips under the group would be
    normalized with the RAW data's (possibly large) mean while the
    augmented samples are sign-symmetric around zero.
    """
    mean_aug = jnp.einsum("gij,j->i", maps, mean) / maps.shape[0]
    m2_aug = jnp.einsum("gij,j->i", maps**2, std**2 + mean**2) / maps.shape[0]
    var = jnp.maximum(m2_aug - mean_aug**2, 1e-12)
    return mean_aug, jnp.sqrt(var)


@dataclasses.dataclass(frozen=True)
class TrainerConfig:
    n_envs: int = 8
    steps_per_itr: int = 200        # env steps per env per outer iteration
    n_itr: int = 10
    model_updates_per_itr: int = 200
    batch_size: int = 128
    buffer_capacity: int = 4000     # per-env time columns
    random_first_itr: bool = True
    eval_envs: int = 8
    eval_modes: Tuple[int, ...] = (0, 1, 2)
    # evaluate every k-th iteration (the final iteration always evaluates —
    # eval episodes are full planner-driven rollouts and can rival collect
    # cost, so sweeps raise this to trade curve resolution for wall-clock)
    eval_every: int = 1
    # --- fit protocol (SURVEY §3.3: the reference fits with epoch passes
    # over the aggregated dataset, persistent train/valid split, and stops
    # when valid loss stops improving) -----------------------------------
    fit_protocol: str = "fixed"     # "fixed" (scan of N updates) | "epochs"
    max_epochs: int = 50            # epoch cap for fit_protocol="epochs"
    early_stop_patience: int = 5    # epochs without valid improvement
    # Which held-out metric gates early stopping (fit_protocol="epochs"):
    #   "loss"    — the model's own training objective (reference behavior).
    #   "fwd_mse" — the forward-head MEAN MSE only. For probabilistic
    #     members the decoupled objective is MSE + NLL, and the NLL term
    #     (logvar calibration) both dwarfs and outlasts the mean-MSE
    #     improvements, so "loss" stops fitting while the planner-visible
    #     means are still improving (r5 cheetah pets_cadm: epochs_run fell
    #     8→3 mid-run as data grew, valid fwd MSE rose 0.024→0.054, and
    #     eval returns halved while the deterministic-ensemble control —
    #     identical mean objective, no NLL in the stop signal — kept
    #     improving). The planner only ever consumes means, so "fwd_mse"
    #     monitors exactly what MPC quality depends on.
    early_stop_metric: str = "loss"
    min_rel_improve: float = 1e-3   # relative valid-loss improvement bar
    valid_batches: int = 4          # minibatches per valid-loss estimate
    # TPU-scale buffers (thousands of vmapped envs) make a literal full pass
    # enormous; an epoch is min(one pass over the dataset, this many
    # updates) — early stopping still governs the number of epochs.
    epoch_updates_cap: int = 500
    # Symmetry-group data augmentation (r5 `leg_aug`): each TRAIN segment is
    # transformed by a uniformly random element of the env's exact symmetry
    # group (env.symmetry_maps(); CrippleAnt: 4-fold leg relabeling,
    # property-tested against the real simulator in tests/test_ant_symmetry).
    # Makes the held-out crippled leg in-distribution for encoder/dynamics
    # training WITHOUT touching episode protocol or eval (valid batches and
    # collect stay raw; norm stats are group-symmetrized so augmented dims
    # normalize consistently). Motivation: the matrix-scale context probe
    # showed the unaugmented encoder maps 100% of held-out leg-3 windows
    # onto "leg 0 crippled" (notebooks/cripple_ant_context_probe.md).
    symmetry_aug: bool = False


class MBTrainer:
    def __init__(
        self,
        env: Env,
        model: Dynamics,
        planner: MPCPlanner,
        config: TrainerConfig,
        mesh=None,
    ):
        """``mesh``: optional jax.sharding.Mesh with ('dp','model') axes —
        envs/history/replay shard over dp, ensemble members over model
        (see cadm_tpu.parallel.mesh). None = single-device."""
        self.env = env
        self.model = model
        self.planner = planner
        self.cfg = config
        self.mesh = mesh
        self._collect_random = jax.jit(
            lambda *a: self._collect(*a, random_actions=True)
        )
        self._collect_plan = jax.jit(
            lambda *a: self._collect(*a, random_actions=False)
        )
        self._sym_maps = None
        if config.symmetry_aug:
            maps = env.symmetry_maps()
            if maps is None:
                raise ValueError(
                    f"symmetry_aug=True but {type(env).__name__} exposes no "
                    "symmetry_maps()"
                )
            self._sym_maps = {
                "obs": jnp.asarray(maps["obs"], jnp.float32),   # (G, d, d)
                "act": jnp.asarray(maps["act"], jnp.float32),   # (G, a, a)
            }
        fit_impl = {
            "fixed": self._fit_impl,
            "epochs": self._fit_epochs_impl,
        }[config.fit_protocol]
        self._fit = jax.jit(fit_impl)
        self._evals = {
            mode: jax.jit(lambda rng, st, m=mode: self._eval_impl(rng, st, m))
            for mode in config.eval_modes
        }
        from cadm_tpu.parallel.mesh import sharded_env_step

        # per-shard kernel execution under a dp mesh (plain vmap otherwise)
        self._step_collect = sharded_env_step(env, mesh, config.n_envs)
        self._step_eval = {
            mode: sharded_env_step(env, mesh, config.eval_envs, mode)
            for mode in config.eval_modes
        }

    # ------------------------------------------------------------- init --
    def init(self, rng: Array):
        r_env, r_model = jax.random.split(rng)
        env_states = jax.vmap(self.env.reset)(
            jax.random.split(r_env, self.cfg.n_envs)
        )
        hists = batched_history(self.model.cfg, self.cfg.n_envs)
        buffer = ReplayBuffer.create(
            self.cfg.n_envs,
            self.cfg.buffer_capacity,
            self.env.obs_dim,
            self.env.act_dim,
        )
        dyn_state = self.model.init_state(r_model)
        if self.mesh is not None:
            from cadm_tpu.parallel.mesh import (
                env_sharding,
                shard_dynamics_state,
                shard_leading_axis,
            )

            es = env_sharding(self.mesh)
            env_states = shard_leading_axis(env_states, es)
            hists = shard_leading_axis(hists, es)
            buffer = shard_leading_axis(buffer, es)
            dyn_state = shard_dynamics_state(dyn_state, self.mesh)
        return env_states, hists, buffer, dyn_state

    # ---------------------------------------------------------- collect --
    def _collect(self, rng, env_states, hists, buffer, dyn_state, random_actions):
        env, model, cfg = self.env, self.model, self.cfg

        def step(carry, k):
            env_states, hists, buffer, ret_acc, plan_mu = carry
            if random_actions:
                actions = jax.random.uniform(
                    k, (cfg.n_envs, env.act_dim), minval=-1.0, maxval=1.0
                )
            else:
                z = model.context_from_history(
                    dyn_state.params, dyn_state.norm, hists
                )
                actions, plan_mu = self.planner.plan(
                    dyn_state, env_states.obs, z, k, plan_mu
                )
            prev_obs = env_states.obs
            ep_step = env_states.t
            next_states, obs, reward, done = self._step_collect(
                env_states, actions
            )
            bad = env.bad_transition(prev_obs, obs)
            buffer = buffer.append(
                prev_obs, actions, obs, done, ep_step, bad=bad,
            )
            pushed = model.push_history(
                dyn_state.params, dyn_state.norm, hists,
                prev_obs, obs - prev_obs, actions,
            )
            # Auto-reset wipes the context window and warm-start plan
            # (new episode, new params).
            done_b = done.reshape((-1, 1, 1))
            plan_mu = jnp.where(done_b, jnp.zeros_like(plan_mu), plan_mu)
            hists = jax.tree.map(
                lambda new: jnp.where(
                    done.reshape((-1,) + (1,) * (new.ndim - 1)),
                    jnp.zeros_like(new),
                    new,
                ),
                pushed,
            )
            ret_acc = ret_acc + reward
            ep_return = jnp.where(done, ret_acc, jnp.nan)
            ret_acc = jnp.where(done, 0.0, ret_acc)
            return (
                (next_states, hists, buffer, ret_acc, plan_mu),
                (ep_return, reward, bad.mean()),
            )

        keys = jax.random.split(rng, cfg.steps_per_itr)
        carry0 = (
            env_states, hists, buffer, jnp.zeros(cfg.n_envs),
            self.planner.init_plan(cfg.n_envs),
        )
        (env_states, hists, buffer, _, _), (ep_returns, rewards, bad_frac) = (
            jax.lax.scan(step, carry0, keys)
        )
        finished = jnp.isfinite(ep_returns)
        mean_return = jnp.where(
            finished.sum() > 0,
            jnp.nansum(jnp.where(finished, ep_returns, 0.0))
            / jnp.maximum(finished.sum(), 1),
            jnp.nan,
        )
        metrics = {
            "collect/mean_episode_return": mean_return,
            "collect/mean_step_reward": rewards.mean(),
            "collect/episodes": finished.sum(),
            # real-env blowup rate: transitions masked out of norm stats /
            # fit / encoder windows (diagnosis signal for the rigid
            # families' stability; planner-side blowups are probed offline
            # by scripts/probe_blowup.py)
            "collect/bad_transition_frac": bad_frac.mean(),
        }
        return env_states, hists, buffer, metrics

    # -------------------------------------------------------------- fit --
    def _refresh_norm(self, buffer: ReplayBuffer, dyn_state: DynamicsState):
        obs, act, dobs, mask = buffer.norm_inputs()
        om, os_ = masked_mean_std(obs, mask)
        am, as_ = masked_mean_std(act, mask)
        dm, ds = masked_mean_std(dobs, mask)
        if self._sym_maps is not None:
            om, os_ = _symmetrize_stats(self._sym_maps["obs"], om, os_)
            am, as_ = _symmetrize_stats(self._sym_maps["act"], am, as_)
            dm, ds = _symmetrize_stats(self._sym_maps["obs"], dm, ds)
        return dataclasses.replace(
            dyn_state, norm=NormStats(om, os_, am, as_, dm, ds)
        )

    def _augment(self, batch, rng):
        """Transform each TRAIN segment by a random group element.

        The per-sample element applies to every obs-like and act-like leaf
        of the segment (history AND future share one element — they are one
        trajectory). precision='highest' on the small matmuls: the default
        f32 dot on this backend accumulates at bf16 grade (~1e-3 relative,
        measured), which would inject systematic noise into every target.
        """
        g = self._sym_maps["obs"].shape[0]
        kidx = jax.random.randint(rng, batch.valid.shape[:-1], 0, g)
        a_o = self._sym_maps["obs"][kidx]       # (..., d, d)
        a_a = self._sym_maps["act"][kidx]       # (..., a, a)

        def app(x, m):
            return jnp.einsum(
                "...td,...od->...to", x, m, precision=jax.lax.Precision.HIGHEST
            )

        return dataclasses.replace(
            batch,
            hist_obs=app(batch.hist_obs, a_o),
            hist_dobs=app(batch.hist_dobs, a_o),
            hist_act=app(batch.hist_act, a_a),
            obs=app(batch.obs, a_o),
            act=app(batch.act, a_a),
            next_obs=app(batch.next_obs, a_o),
        )

    def _sample(self, buffer, rng, split):
        r_seg, r_aug = jax.random.split(rng)
        batch = buffer.sample_segments(
            r_seg,
            (self.model.cfg.n_members, self.cfg.batch_size),
            self.model.cfg.history_k,
            self.model.cfg.future_m,
            split=split,
        )
        # valid batches stay raw: early stopping measures true-task quality
        if self._sym_maps is not None and split == "train":
            batch = self._augment(batch, r_aug)
        return batch

    def _valid_metrics(self, buffer, rng, dyn_state):
        """(mean valid loss, mean forward-MEAN MSE) over ``valid_batches``
        held-out minibatches — one forward pass computes both (the MSE is
        planner-relevant quality: NLL improves when variance shrinks even if
        the means degrade)."""
        def one(k):
            batch = self._sample(buffer, k, "valid")
            loss, m = self.model.loss(dyn_state.params, dyn_state.norm, batch)
            # GrBAL's loss does not report the key (its MSE IS the loss)
            return loss, m.get("fwd_mean_mse", jnp.nan)

        keys = jax.random.split(rng, self.cfg.valid_batches)
        losses, mses = jax.vmap(one)(keys)
        return losses.mean(), mses.mean()

    def _valid_loss(self, buffer, rng, dyn_state):
        """Mean loss over ``valid_batches`` held-out minibatches (the unused
        MSE output is dead-code-eliminated under jit)."""
        return self._valid_metrics(buffer, rng, dyn_state)[0]

    def _fit_impl(self, rng, buffer: ReplayBuffer, dyn_state: DynamicsState):
        """Round-1 protocol: fixed scan of ``model_updates_per_itr`` Adam
        steps on the train partition, valid loss before/after."""
        cfg = self.cfg
        dyn_state = self._refresh_norm(buffer, dyn_state)

        def upd(st, k):
            st, metrics = self.model.update(st, self._sample(buffer, k, "train"))
            return st, metrics["model_loss"]

        r_train, r_valid = jax.random.split(rng)
        val_before = self._valid_loss(buffer, r_valid, dyn_state)
        keys = jax.random.split(r_train, cfg.model_updates_per_itr)
        dyn_state, losses = jax.lax.scan(upd, dyn_state, keys)
        val_after, fwd_mse_after = self._valid_metrics(buffer, r_valid, dyn_state)
        return dyn_state, {
            "fit/model_loss_first": losses[0],
            "fit/model_loss_last": losses[-1],
            "fit/model_loss_mean": losses.mean(),
            "fit/valid_loss_before": val_before,
            "fit/valid_loss_after": val_after,
            "fit/valid_fwd_mse_after": fwd_mse_after,
        }

    def _fit_epochs_impl(self, rng, buffer: ReplayBuffer, dyn_state: DynamicsState):
        """Reference fit protocol (SURVEY §3.3): epoch passes over the
        aggregated dataset with early stop on held-out valid loss.

        Static-shape design: an outer scan over ``max_epochs`` whose body is
        wrapped in ``lax.cond`` on the early-stop flag (skipped epochs cost
        ~nothing at runtime); the inner scan covers the whole buffer but
        masks minibatches past the CURRENT dataset's one-pass count, so an
        epoch is a true pass over today's data without recompilation as the
        buffer grows.
        """
        model, cfg = self.model, self.cfg
        dyn_state = self._refresh_norm(buffer, dyn_state)

        # one epoch = ceil(train anchors per env * n_envs / batch) updates,
        # capped at epoch_updates_cap (see TrainerConfig)
        mb_cap = min(
            cfg.epoch_updates_cap,
            max(1, -(-buffer.capacity * cfg.n_envs * 9 // 10 // cfg.batch_size)),
        )
        n_mb = jnp.minimum(
            jnp.maximum(
                -(-buffer.n_train_anchors() * cfg.n_envs) // cfg.batch_size, 1
            ),
            mb_cap,
        )

        def epoch_body(carry, k_epoch):
            st, best, since, stopped = carry

            def run_epoch(st):
                def upd(st, arg):
                    i, k = arg

                    def do(st):
                        st, m = model.update(st, self._sample(buffer, k, "train"))
                        return st, m["model_loss"]

                    return jax.lax.cond(
                        i < n_mb, do, lambda st: (st, jnp.nan), st
                    )

                keys = jax.random.split(k_epoch, mb_cap + 1)
                st, losses = jax.lax.scan(
                    upd, st, (jnp.arange(mb_cap), keys[:-1])
                )
                v_loss, v_mse = self._valid_metrics(buffer, keys[-1], st)
                val = v_mse if cfg.early_stop_metric == "fwd_mse" else v_loss
                return st, val, jnp.nanmean(losses)

            def skip_epoch(st):
                return st, jnp.nan, jnp.nan

            st, val, train_loss = jax.lax.cond(
                stopped, skip_epoch, run_epoch, st
            )
            improved = val < best * (1.0 - cfg.min_rel_improve)
            best = jnp.where(stopped, best, jnp.minimum(best, val))
            since = jnp.where(
                stopped, since, jnp.where(improved, 0, since + 1)
            )
            stopped = stopped | (since >= cfg.early_stop_patience)
            return (st, best, since, stopped), (val, train_loss)

        r_init, r_epochs = jax.random.split(rng)
        v0_loss, v0_mse = self._valid_metrics(buffer, r_init, dyn_state)
        val0 = v0_mse if cfg.early_stop_metric == "fwd_mse" else v0_loss
        carry0 = (dyn_state, val0, jnp.zeros((), jnp.int32), jnp.zeros((), bool))
        (dyn_state, best, _, _), (vals, train_losses) = jax.lax.scan(
            epoch_body, carry0, jax.random.split(r_epochs, cfg.max_epochs)
        )
        ran = jnp.isfinite(vals)
        loss_after, mse_after = self._valid_metrics(buffer, r_init, dyn_state)
        return dyn_state, {
            "fit/model_loss_first": train_losses[0],
            "fit/model_loss_last": jnp.where(
                ran.any(), train_losses[jnp.maximum(ran.sum() - 1, 0)], jnp.nan
            ),
            "fit/model_loss_mean": jnp.nanmean(train_losses),
            # valid_loss_* always report the model's own objective; the
            # early-stop signal ('best' of the monitored metric) is logged
            # separately so fwd_mse monitoring doesn't relabel these keys
            "fit/valid_loss_before": v0_loss,
            "fit/valid_loss_after": loss_after,
            "fit/valid_monitored_best": best,
            "fit/valid_fwd_mse_after": mse_after,
            "fit/epochs_run": ran.sum(),
        }

    # ------------------------------------------------------------- eval --
    def _eval_impl(self, rng, dyn_state: DynamicsState, mode: int):
        """One full planner-driven episode per eval env on a dynamics range."""
        env, model, cfg = self.env, self.model, self.cfg
        r_reset, r_run = jax.random.split(rng)
        states = jax.vmap(lambda k: env.reset(k, mode))(
            jax.random.split(r_reset, cfg.eval_envs)
        )
        hists = batched_history(model.cfg, cfg.eval_envs)

        def step(carry, k):
            states, hists, ret, alive, plan_mu = carry
            z = model.context_from_history(
                dyn_state.params, dyn_state.norm, hists
            )
            actions, plan_mu = self.planner.plan(
                dyn_state, states.obs, z, k, plan_mu
            )
            prev_obs = states.obs
            next_states, obs, reward, done = self._step_eval[mode](
                states, actions
            )
            hists = model.push_history(
                dyn_state.params, dyn_state.norm, hists,
                prev_obs, obs - prev_obs, actions,
            )
            # accumulate a single episode per env (stop at first done)
            ret = ret + reward * alive
            alive = alive * (1.0 - done.astype(jnp.float32))
            return (next_states, hists, ret, alive, plan_mu), done

        keys = jax.random.split(r_run, env.horizon)
        (_, _, returns, _, _), _ = jax.lax.scan(
            step,
            (
                states, hists, jnp.zeros(cfg.eval_envs),
                jnp.ones(cfg.eval_envs),
                self.planner.init_plan(cfg.eval_envs),
            ),
            keys,
        )
        return returns

    # ------------------------------------------------------- checkpoint --
    @staticmethod
    def checkpoint_payload(env_states, hists, buffer, dyn_state, rng):
        """The FULL training pytree: resuming from it reproduces the exact
        metrics trajectory of an uninterrupted run. The CEM warm-start plan
        is initialized per collect call (not cross-iteration state), so itr
        boundaries are exact resume points without it."""
        return {
            "state": dyn_state,
            "buffer": buffer,
            "env_states": env_states,
            "hists": hists,
            "rng": jax.random.key_data(rng),
        }

    def resume_template(self):
        """A payload-shaped pytree (shapes/dtypes only) for Orbax restore."""
        env_states, hists, buffer, dyn_state = self.init(jax.random.key(0))
        return self.checkpoint_payload(
            env_states, hists, buffer, dyn_state, jax.random.key(0)
        )

    # ------------------------------------------------------------ train --
    def train(self, rng: Array, logger=None, checkpointer=None, traj_sink=None,
              start_itr: int = 0, initial_dyn_state=None, resume=None):
        """Run the full outer loop; returns final (dyn_state, metrics_history).

        ``traj_sink``: optional cadm_tpu.utils.trajsink.TrajectorySink — each
        iteration's newly collected transitions are handed to the native
        async writer (one device→host transfer per iteration, never blocking
        the jitted loop).
        ``resume``: a restored checkpoint payload (see checkpoint_payload)
        plus "itr" (the step it was saved at) — continues with the exact
        buffer/env/history/rng state, producing the same metrics as an
        uninterrupted run.
        ``start_itr``/``initial_dyn_state``: weaker warm-start path — restore
        only the model state; replay is re-collected and the first resumed
        iteration plans with the restored model rather than random.
        """
        import numpy as _np

        r_init, rng = jax.random.split(rng)
        env_states, hists, buffer, dyn_state = self.init(r_init)
        if resume is not None:
            dyn_state = resume["state"]
            buffer = resume["buffer"]
            env_states = resume["env_states"]
            hists = resume["hists"]
            rng = jax.random.wrap_key_data(jnp.asarray(resume["rng"]))
            start_itr = int(resume["itr"]) + 1
        elif initial_dyn_state is not None:
            dyn_state = initial_dyn_state
        history = []
        for itr in range(start_itr, self.cfg.n_itr):
            rng, k_col, k_fit, k_eval = jax.random.split(rng, 4)
            use_random = (
                self.cfg.random_first_itr and itr == 0
                and initial_dyn_state is None
            )
            collect = self._collect_random if use_random else self._collect_plan
            env_states, hists, buffer, col_metrics = collect(
                k_col, env_states, hists, buffer, dyn_state
            )
            dyn_state, fit_metrics = self._fit(k_fit, buffer, dyn_state)
            metrics = {"itr": itr, **col_metrics, **fit_metrics}
            do_eval = (
                (itr + 1) % self.cfg.eval_every == 0
                or itr == self.cfg.n_itr - 1
            )
            if do_eval:
                eval_keys = jax.random.split(k_eval, max(len(self._evals), 1))
                for (mode, fn), k_mode in zip(self._evals.items(), eval_keys):
                    returns = fn(k_mode, dyn_state)
                    metrics[f"eval/return_mode{mode}"] = returns.mean()
                    metrics[f"eval/return_mode{mode}_std"] = returns.std()
            metrics = {
                k: (float(v) if hasattr(v, "item") else v)
                for k, v in metrics.items()
            }
            history.append(metrics)
            if logger is not None:
                for k, v in metrics.items():
                    logger.logkv(k, v)
                logger.dumpkvs()
            if checkpointer is not None:
                checkpointer.save(
                    itr,
                    self.checkpoint_payload(
                        env_states, hists, buffer, dyn_state, rng
                    ),
                )
            if traj_sink is not None:
                n = self.cfg.steps_per_itr
                end = int(buffer.ptr)
                sl = _np.arange(end - n, end) % buffer.capacity
                for name, field in (
                    ("obs", buffer.obs), ("act", buffer.act),
                    ("next_obs", buffer.next_obs),
                ):
                    traj_sink.append(
                        f"itr{itr}/{name}", _np.asarray(field[:, sl])
                    )
        return dyn_state, history
