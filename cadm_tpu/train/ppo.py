"""PPO + CaDM: model-free policy conditioned on the learned context.

Reference semantics (arXiv:2005.06800 §4.3, SURVEY.md §2.1 "PPO + CaDM"):
a PPO policy/value pair whose inputs are concat(obs, z), where z comes from
the CaDM context encoder trained JOINTLY with the forward/backward dynamics
losses on the same rollout data. The policy sees the hidden dynamics only
through z — generalization across randomized physics comes from the encoder.

TPU design: one jitted collect scan (policy + encoder + env + history ring +
replay append fused, vmapped over envs); PPO update = GAE on the collected
(T, E) block + scanned clipped-surrogate minibatch epochs; CaDM dynamics
update = the standard segment-sampled fit on the shared replay buffer.
Gradients do NOT flow from PPO into the encoder (stop-gradient on z), which
keeps the context a pure dynamics representation as in the paper.
"""
from __future__ import annotations

import dataclasses
from typing import Tuple

import jax
import jax.numpy as jnp
import optax
from flax import struct

from cadm_tpu.core.types import Array, History, PyTree, batched_history
from cadm_tpu.envs.base import Env
from cadm_tpu.models.dynamics import Dynamics, DynamicsState
from cadm_tpu.models.nets import mlp_apply, mlp_init
from cadm_tpu.train.buffer import ReplayBuffer, masked_mean_std
from cadm_tpu.train.mb_trainer import TrainerConfig  # noqa: F401 (re-export)


@dataclasses.dataclass(frozen=True)
class PPOConfig:
    n_envs: int = 32
    rollout_len: int = 128
    n_itr: int = 50
    policy_hidden: Tuple[int, ...] = (64, 64)
    lr: float = 3e-4
    gamma: float = 0.99
    gae_lambda: float = 0.95
    clip_eps: float = 0.2
    value_coef: float = 0.5
    entropy_coef: float = 0.0
    ppo_epochs: int = 10
    minibatches: int = 4
    max_grad_norm: float = 0.5
    # CaDM side
    model_updates_per_itr: int = 200
    model_batch: int = 128
    buffer_capacity: int = 4096
    # shifted-range evaluation (the point of PPO+CaDM, paper §4.3): full
    # episodes with the DETERMINISTIC policy mean on each dynamics range
    eval_envs: int = 16
    eval_modes: Tuple[int, ...] = (0, 1, 2)


@struct.dataclass
class PPOState:
    params: PyTree        # {'policy': mlp, 'log_std': (act,), 'value': mlp}
    opt_state: PyTree
    updates: Array


class PPOTrainer:
    def __init__(self, env: Env, model: Dynamics, config: PPOConfig, mesh=None):
        self.env = env
        self.model = model
        self.cfg = config
        self.mesh = mesh
        self.tx = optax.chain(
            optax.clip_by_global_norm(config.max_grad_norm),
            optax.adam(config.lr),
        )
        self._collect = jax.jit(self._collect_impl)
        self._ppo_update = jax.jit(self._ppo_update_impl)
        self._fit_model = jax.jit(self._fit_model_impl)
        self._evals = {
            mode: jax.jit(lambda rng, ps, ds, m=mode: self._eval_impl(rng, ps, ds, m))
            for mode in config.eval_modes
        }
        from cadm_tpu.parallel.mesh import sharded_env_step

        self._step_collect = sharded_env_step(env, mesh, config.n_envs)
        self._step_eval = {
            mode: sharded_env_step(env, mesh, config.eval_envs, mode)
            for mode in config.eval_modes
        }

    # ------------------------------------------------------------- init --
    @property
    def _pol_in(self) -> int:
        return self.env.obs_dim + self.model.cfg.context_dim

    def init(self, rng: Array):
        r_env, r_pol, r_val, r_dyn = jax.random.split(rng, 4)
        cfg = self.cfg
        env_states = jax.vmap(self.env.reset)(
            jax.random.split(r_env, cfg.n_envs)
        )
        hists = batched_history(self.model.cfg, cfg.n_envs)
        params = {
            "policy": mlp_init(
                r_pol, [self._pol_in, *cfg.policy_hidden, self.env.act_dim]
            ),
            "log_std": jnp.full((self.env.act_dim,), -0.5),
            "value": mlp_init(r_val, [self._pol_in, *cfg.policy_hidden, 1]),
        }
        ppo_state = PPOState(
            params=params,
            opt_state=self.tx.init(params),
            updates=jnp.zeros((), jnp.int32),
        )
        dyn_state = self.model.init_state(r_dyn)
        buffer = ReplayBuffer.create(
            cfg.n_envs, cfg.buffer_capacity, self.env.obs_dim, self.env.act_dim
        )
        if self.mesh is not None:
            from cadm_tpu.parallel.mesh import (
                env_sharding,
                replicated,
                shard_dynamics_state,
                shard_leading_axis,
            )

            es = env_sharding(self.mesh)
            env_states = shard_leading_axis(env_states, es)
            hists = shard_leading_axis(hists, es)
            buffer = shard_leading_axis(buffer, es)
            dyn_state = shard_dynamics_state(dyn_state, self.mesh)
            ppo_state = jax.tree.map(
                lambda x: jax.device_put(x, replicated(self.mesh)), ppo_state
            )
        return env_states, hists, buffer, ppo_state, dyn_state

    # ----------------------------------------------------------- policy --
    def _dist(self, params: PyTree, obs_z: Array) -> Tuple[Array, Array]:
        mean = mlp_apply(params["policy"], obs_z, activation=jnp.tanh)
        return mean, params["log_std"]

    def _logp(self, mean: Array, log_std: Array, act: Array) -> Array:
        var = jnp.exp(2 * log_std)
        return jnp.sum(
            -0.5 * ((act - mean) ** 2 / var + 2 * log_std + jnp.log(2 * jnp.pi)),
            axis=-1,
        )

    # ---------------------------------------------------------- collect --
    def _collect_impl(self, rng, env_states, hists, buffer, ppo_state, dyn_state):
        env, model, cfg = self.env, self.model, self.cfg

        def step(carry, k):
            env_states, hists, buffer, ret_acc = carry
            z = jax.lax.stop_gradient(
                model.context_from_history(
                    dyn_state.params, dyn_state.norm, hists
                )
            )
            obs_z = jnp.concatenate([env_states.obs, z], axis=-1)
            mean, log_std = self._dist(ppo_state.params, obs_z)
            k_act, _ = jax.random.split(k)
            act = mean + jnp.exp(log_std) * jax.random.normal(k_act, mean.shape)
            act = jnp.clip(act, -1.0, 1.0)
            logp = self._logp(mean, log_std, act)
            value = mlp_apply(
                ppo_state.params["value"], obs_z, activation=jnp.tanh
            )[..., 0]
            prev_obs, ep_step = env_states.obs, env_states.t
            next_states, obs, reward, done = self._step_collect(
                env_states, act
            )
            buffer = buffer.append(
                prev_obs, act, obs, done, ep_step,
                bad=env.bad_transition(prev_obs, obs),
            )
            pushed = model.push_history(
                dyn_state.params, dyn_state.norm, hists,
                prev_obs, obs - prev_obs, act,
            )
            hists = jax.tree.map(
                lambda new: jnp.where(
                    done.reshape((-1,) + (1,) * (new.ndim - 1)),
                    jnp.zeros_like(new),
                    new,
                ),
                pushed,
            )
            # true episode returns, reported only at episode end
            ret_acc = ret_acc + reward
            ep_return = jnp.where(done, ret_acc, jnp.nan)
            ret_acc = jnp.where(done, 0.0, ret_acc)
            out = dict(
                obs_z=obs_z, act=act, logp=logp, value=value,
                reward=reward, done=done, ep_return=ep_return,
            )
            return (next_states, hists, buffer, ret_acc), out

        keys = jax.random.split(rng, cfg.rollout_len)
        (env_states, hists, buffer, _), traj = jax.lax.scan(
            step, (env_states, hists, buffer, jnp.zeros(cfg.n_envs)), keys
        )
        # bootstrap value of final state
        z = model.context_from_history(
            dyn_state.params, dyn_state.norm, hists
        )
        obs_z = jnp.concatenate([env_states.obs, z], axis=-1)
        last_value = mlp_apply(
            ppo_state.params["value"], obs_z, activation=jnp.tanh
        )[..., 0]
        return env_states, hists, buffer, traj, last_value

    # -------------------------------------------------------------- gae --
    def _gae(self, traj, last_value):
        cfg = self.cfg

        def back(carry, t):
            gae, next_value = carry
            nonterminal = 1.0 - t["done"].astype(jnp.float32)
            delta = (
                t["reward"] + cfg.gamma * next_value * nonterminal - t["value"]
            )
            gae = delta + cfg.gamma * cfg.gae_lambda * nonterminal * gae
            return (gae, t["value"]), gae

        (_, _), adv = jax.lax.scan(
            back,
            (jnp.zeros_like(last_value), last_value),
            traj,
            reverse=True,
        )
        returns = adv + traj["value"]
        adv = (adv - adv.mean()) / (adv.std() + 1e-8)
        return adv, returns

    # ------------------------------------------------------------ update --
    def _ppo_update_impl(self, rng, ppo_state, traj, last_value):
        cfg = self.cfg
        adv, returns = self._gae(traj, last_value)
        flat = jax.tree.map(
            lambda x: x.reshape((-1,) + x.shape[2:]),
            {**traj, "adv": adv, "ret": returns},
        )
        n = flat["adv"].shape[0]
        mb = n // cfg.minibatches

        def loss_fn(params, batch):
            mean, log_std = self._dist(params, batch["obs_z"])
            logp = self._logp(mean, log_std, batch["act"])
            ratio = jnp.exp(logp - batch["logp"])
            s1 = ratio * batch["adv"]
            s2 = jnp.clip(ratio, 1 - cfg.clip_eps, 1 + cfg.clip_eps) * batch["adv"]
            pg_loss = -jnp.mean(jnp.minimum(s1, s2))
            value = mlp_apply(
                params["value"], batch["obs_z"], activation=jnp.tanh
            )[..., 0]
            v_loss = jnp.mean((value - batch["ret"]) ** 2)
            entropy = jnp.sum(log_std + 0.5 * jnp.log(2 * jnp.pi * jnp.e))
            total = (
                pg_loss + cfg.value_coef * v_loss - cfg.entropy_coef * entropy
            )
            return total, {"pg_loss": pg_loss, "v_loss": v_loss}

        def epoch(carry, k):
            ppo_state = carry
            perm = jax.random.permutation(k, n)

            def mb_step(ppo_state, idx):
                batch = jax.tree.map(lambda x: x[idx], flat)
                (loss, aux), grads = jax.value_and_grad(
                    loss_fn, has_aux=True
                )(ppo_state.params, batch)
                updates, opt_state = self.tx.update(
                    grads, ppo_state.opt_state, ppo_state.params
                )
                params = optax.apply_updates(ppo_state.params, updates)
                return (
                    PPOState(
                        params=params,
                        opt_state=opt_state,
                        updates=ppo_state.updates + 1,
                    ),
                    loss,
                )

            idxs = perm[: mb * cfg.minibatches].reshape(cfg.minibatches, mb)
            ppo_state, losses = jax.lax.scan(mb_step, ppo_state, idxs)
            return ppo_state, losses.mean()

        keys = jax.random.split(rng, cfg.ppo_epochs)
        ppo_state, losses = jax.lax.scan(epoch, ppo_state, keys)
        return ppo_state, {
            "ppo/loss_first": losses[0],
            "ppo/loss_last": losses[-1],
        }

    # --------------------------------------------------------- fit model --
    def _fit_model_impl(self, rng, buffer: ReplayBuffer, dyn_state: DynamicsState):
        model, cfg = self.model, self.cfg
        obs, act, dobs, mask = buffer.norm_inputs()
        from cadm_tpu.models.dynamics import NormStats

        om, os_ = masked_mean_std(obs, mask)
        am, as_ = masked_mean_std(act, mask)
        dm, ds = masked_mean_std(dobs, mask)
        dyn_state = dataclasses.replace(
            dyn_state, norm=NormStats(om, os_, am, as_, dm, ds)
        )

        def upd(st, k):
            batch = buffer.sample_segments(
                k, (model.cfg.n_members, cfg.model_batch),
                model.cfg.history_k, model.cfg.future_m, split="train",
            )
            st, metrics = model.update(st, batch)
            return st, metrics["model_loss"]

        r_train, r_valid = jax.random.split(rng)
        dyn_state, losses = jax.lax.scan(
            upd, dyn_state, jax.random.split(r_train, cfg.model_updates_per_itr)
        )
        val_batch = buffer.sample_segments(
            r_valid, (model.cfg.n_members, cfg.model_batch),
            model.cfg.history_k, model.cfg.future_m, split="valid",
        )
        val_loss, _ = model.loss(dyn_state.params, dyn_state.norm, val_batch)
        return dyn_state, {
            "fit/model_loss_last": losses[-1],
            "fit/valid_loss": val_loss,
        }

    # -------------------------------------------------------------- eval --
    def _eval_impl(self, rng, ppo_state, dyn_state, mode: int):
        """Full single episodes with the deterministic policy mean on a
        shifted dynamics range (paper §4.3's evaluation protocol)."""
        env, model, cfg = self.env, self.model, self.cfg
        r_reset, _ = jax.random.split(rng)
        states = jax.vmap(lambda k: env.reset(k, mode))(
            jax.random.split(r_reset, cfg.eval_envs)
        )
        hists = batched_history(model.cfg, cfg.eval_envs)

        def step(carry, _):
            states, hists, ret, alive = carry
            z = model.context_from_history(
                dyn_state.params, dyn_state.norm, hists
            )
            obs_z = jnp.concatenate([states.obs, z], axis=-1)
            act, _ = self._dist(ppo_state.params, obs_z)
            act = jnp.clip(act, -1.0, 1.0)
            prev_obs = states.obs
            next_states, obs, reward, done = self._step_eval[mode](
                states, act
            )
            hists = model.push_history(
                dyn_state.params, dyn_state.norm, hists,
                prev_obs, obs - prev_obs, act,
            )
            ret = ret + reward * alive
            alive = alive * (1.0 - done.astype(jnp.float32))
            return (next_states, hists, ret, alive), None

        (_, _, returns, _), _ = jax.lax.scan(
            step,
            (
                states, hists, jnp.zeros(cfg.eval_envs),
                jnp.ones(cfg.eval_envs),
            ),
            None,
            length=env.horizon,
        )
        return returns

    # ------------------------------------------------------- checkpoint --
    @staticmethod
    def checkpoint_payload(env_states, hists, buffer, ppo_state, dyn_state, rng):
        return {
            "ppo_state": ppo_state,
            "state": dyn_state,
            "buffer": buffer,
            "env_states": env_states,
            "hists": hists,
            "rng": jax.random.key_data(rng),
        }

    def resume_template(self):
        env_states, hists, buffer, ppo_state, dyn_state = self.init(
            jax.random.key(0)
        )
        return self.checkpoint_payload(
            env_states, hists, buffer, ppo_state, dyn_state, jax.random.key(0)
        )

    # ------------------------------------------------------------- train --
    def train(self, rng: Array, logger=None, checkpointer=None, resume=None):
        import numpy as _np

        r_init, rng = jax.random.split(rng)
        env_states, hists, buffer, ppo_state, dyn_state = self.init(r_init)
        start_itr = 0
        if resume is not None:
            ppo_state = resume["ppo_state"]
            dyn_state = resume["state"]
            buffer = resume["buffer"]
            env_states = resume["env_states"]
            hists = resume["hists"]
            rng = jax.random.wrap_key_data(jnp.asarray(resume["rng"]))
            start_itr = int(resume["itr"]) + 1
        history = []
        for itr in range(start_itr, self.cfg.n_itr):
            rng, k_col, k_ppo, k_fit, k_eval = jax.random.split(rng, 5)
            env_states, hists, buffer, traj, last_value = self._collect(
                k_col, env_states, hists, buffer, ppo_state, dyn_state
            )
            ep_returns = traj.pop("ep_return")
            ppo_state, ppo_metrics = self._ppo_update(
                k_ppo, ppo_state, traj, last_value
            )
            dyn_state, fit_metrics = self._fit_model(k_fit, buffer, dyn_state)
            finished = _np.isfinite(_np.asarray(ep_returns))
            mean_ep = (
                float(_np.asarray(ep_returns)[finished].mean())
                if finished.any()
                else float("nan")
            )
            metrics = {
                "itr": itr,
                "collect/mean_episode_return": mean_ep,
                "collect/episodes": int(finished.sum()),
                "collect/rollout_reward_per_env": float(
                    traj["reward"].sum(axis=0).mean()
                ),
                **{k: float(v) for k, v in ppo_metrics.items()},
                **{k: float(v) for k, v in fit_metrics.items()},
            }
            eval_keys = jax.random.split(k_eval, max(len(self._evals), 1))
            for (mode, fn), k_mode in zip(self._evals.items(), eval_keys):
                returns = fn(k_mode, ppo_state, dyn_state)
                metrics[f"eval/return_mode{mode}"] = float(returns.mean())
                metrics[f"eval/return_mode{mode}_std"] = float(returns.std())
            history.append(metrics)
            if logger is not None:
                for k, v in metrics.items():
                    logger.logkv(k, v)
                logger.dumpkvs()
            if checkpointer is not None:
                checkpointer.save(
                    itr,
                    self.checkpoint_payload(
                        env_states, hists, buffer, ppo_state, dyn_state, rng
                    ),
                )
        return ppo_state, dyn_state, history
