"""Named experiment presets: the five driver configs (BASELINE.json configs,
SURVEY.md §5 config row) plus the reference's full flag surface as a
dataclass.

The reference assembles argparse flags into kwargs dicts per run script
(SURVEY §2.1 "Run scripts / CLI"); here a single ``ExperimentConfig``
carries the same knobs — env/dataset name, model class (vanilla/ensemble
× ±CaDM/stacked), planner kind (RS/CEM), candidates, horizon, K, M, β,
ensemble size, hidden sizes, lr, updates/itr, n_itr, rollout sizes, eval
ranges, seed — and builds the component stack.
"""
from __future__ import annotations

import dataclasses
from typing import Optional, Tuple

from cadm_tpu.envs import make
from cadm_tpu.models.dynamics import Dynamics, DynamicsConfig
from cadm_tpu.planners.mpc import MPCPlanner, PlannerConfig
from cadm_tpu.train.mb_trainer import MBTrainer, TrainerConfig


@dataclasses.dataclass(frozen=True)
class ExperimentConfig:
    # trainer kind: "mb" = model-based MPC loop; "ppo" = PPO+CaDM (paper §4.3)
    trainer: str = "mb"
    # env
    env: str = "cartpole"
    n_envs: int = 16
    randomization: str = "discrete"   # paper scale sets | "continuous" bands
    # wrap in NormalizedEnv (the reference's normalize(); action rescaling
    # from the canonical [-1,1] box onto native limits — obs whitening is
    # opt-in via the wrapper directly, since planner rewards need raw obs)
    normalize_env: bool = False
    # Episode protocol overrides (None = family default). The MBBL lineage
    # the reference envs follow (Wang et al. 2019) removes early termination
    # and fixes episodes at 1000 steps; set terminate_unhealthy=False,
    # env_horizon=1000 on hopper/slim_humanoid to reproduce paper-scale
    # returns (the healthy-termination defaults cap returns at the fall time)
    terminate_unhealthy: Optional[bool] = None
    env_horizon: Optional[int] = None
    # model
    model: str = "cadm"           # vanilla | stacked | cadm | rnn | grbal
    ensemble: int = 1             # >1 = PE-TS-style probabilistic ensemble
    # None = auto (PETS convention: ensemble members get NLL heads); True =
    # force NLL on a single member; False = force deterministic-MSE members
    # even at ensemble>1 (diagnostic control for the NLL-vs-ensemble split)
    probabilistic: Optional[bool] = None
    # NLL mean-anchor weight for probabilistic members (0 disables); see
    # DynamicsConfig.mean_anchor for the rationale (round-4 pets_cadm fix)
    mean_anchor: float = 1.0
    # detach the logvar head from the trunk (opt-in r5 variant; see
    # DynamicsConfig.detach_logvar_trunk)
    detach_logvar_trunk: bool = False
    hidden: Tuple[int, ...] = (200, 200, 200, 200)
    z_dim: int = 10
    history_k: int = 10
    future_m: int = 10
    beta_backward: float = 0.5
    lr: float = 1e-3
    # planner
    planner: str = "cem"          # rs | cem
    n_candidates: int = 200
    plan_horizon: int = 30
    cem_iters: int = 5
    cem_elites: int = 20
    warm_start: bool = False
    # ensemble propagation during planning: 'ts1' = PETS TS1 (candidate->
    # member assignment resampled every model step; single-model cost, no
    # single-member winner's curse), 'assign' = TS∞-block (fixed member per
    # rollout; cheapest but CEM elites can exploit one optimistic member),
    # 'mean' = every candidate under every member, elites ranked on the
    # member-mean return (n_members x the rollout rows)
    ensemble_eval: str = "ts1"
    # env×candidate(×member) rollout rows per parallel planner block — the
    # libtpu fault threshold is shape-dependent (cheetah runs at 65536 rows,
    # slim_humanoid faults at 65520), so wide-obs families lower this
    max_parallel_rollouts: int = 65536
    # training loop
    n_itr: int = 20
    steps_per_itr: int = 200
    model_updates_per_itr: int = 500
    batch_size: int = 128
    buffer_capacity: int = 8000
    eval_envs: int = 16
    eval_modes: Tuple[int, ...] = (0, 1, 2)
    eval_every: int = 1
    seed: int = 0
    # fit protocol (SURVEY §3.3): "epochs" = reference-style epoch passes
    # with early stop on held-out valid loss; "fixed" = flat update scan
    fit_protocol: str = "fixed"
    max_epochs: int = 8
    early_stop_patience: int = 2
    # early-stop signal: "loss" (the model objective) or "fwd_mse" (the
    # planner-visible forward-mean MSE; see TrainerConfig.early_stop_metric)
    early_stop_metric: str = "loss"
    epoch_updates_cap: int = 400
    # symmetry-group train-batch augmentation (envs exposing symmetry_maps();
    # see TrainerConfig.symmetry_aug — the r5 CrippleAnt leg_aug variant)
    symmetry_aug: bool = False
    # PPO-only knobs (used when trainer="ppo")
    rollout_len: int = 256
    ppo_lr: float = 3e-4
    ppo_epochs: int = 10
    ppo_minibatches: int = 8
    policy_hidden: Tuple[int, ...] = (64, 64)

    def build(self, mesh=None):
        if self.n_envs < 1 or self.eval_envs < 1:
            raise ValueError(
                f"n_envs/eval_envs must be >= 1, got {self.n_envs}/{self.eval_envs}"
            )
        if self.trainer == "ppo":
            return self._build_ppo(mesh)
        env = self._make_env()
        if self.model == "grbal":
            return self._build_grbal(env, mesh)
        context = {
            "vanilla": "none",
            "stacked": "stacked",
            "cadm": "encoder",
            "rnn": "rnn",
        }[self.model]
        model = Dynamics(
            DynamicsConfig(
                obs_dim=env.obs_dim,
                act_dim=env.act_dim,
                hidden=self.hidden,
                n_members=self.ensemble,
                probabilistic=(self.ensemble > 1 if self.probabilistic is None
                               else self.probabilistic),
                context=context,
                z_dim=self.z_dim,
                history_k=self.history_k,
                future_m=self.future_m,
                beta_backward=self.beta_backward,
                lr=self.lr,
                mean_anchor=self.mean_anchor,
                detach_logvar_trunk=self.detach_logvar_trunk,
            )
        )
        planner = MPCPlanner(
            PlannerConfig(
                kind=self.planner,
                horizon=self.plan_horizon,
                n_candidates=self.n_candidates,
                cem_iters=self.cem_iters,
                cem_elites=self.cem_elites,
                warm_start=self.warm_start,
                ensemble_eval=self.ensemble_eval,
                max_parallel_rollouts=self.max_parallel_rollouts,
            ),
            model,
            env.reward,
            env.act_dim,
            # env-defined blowup limits terminate+penalize exploding MODEL
            # rollouts (inf on analytic envs = guard statically off)
            bad_transition_fn=env.bad_transition,
            obs_limit=env.bad_obs_limit,
        )
        trainer = MBTrainer(
            env,
            model,
            planner,
            TrainerConfig(
                n_envs=self.n_envs,
                steps_per_itr=self.steps_per_itr,
                n_itr=self.n_itr,
                model_updates_per_itr=self.model_updates_per_itr,
                batch_size=self.batch_size,
                buffer_capacity=self.buffer_capacity,
                eval_envs=self.eval_envs,
                eval_modes=self.eval_modes,
                eval_every=self.eval_every,
                fit_protocol=self.fit_protocol,
                max_epochs=self.max_epochs,
                early_stop_patience=self.early_stop_patience,
                early_stop_metric=self.early_stop_metric,
                epoch_updates_cap=self.epoch_updates_cap,
                symmetry_aug=self.symmetry_aug,
            ),
            mesh=mesh,
        )
        return env, model, planner, trainer

    def _make_env(self):
        overrides = {}
        if self.terminate_unhealthy is not None:
            overrides["terminate_unhealthy"] = self.terminate_unhealthy
        if self.env_horizon is not None:
            overrides["horizon"] = self.env_horizon
        env = make(self.env, randomization=self.randomization, **overrides)
        if self.normalize_env:
            from cadm_tpu.envs.wrappers import NormalizedEnv

            env = NormalizedEnv(env)
        return env

    def _build_ppo(self, mesh):
        """PPO+CaDM stack (paper §4.3): policy on concat(obs, z) with the
        encoder fit jointly on the shared replay buffer."""
        from cadm_tpu.train.ppo import PPOConfig, PPOTrainer

        env = self._make_env()
        context = {"vanilla": "none", "stacked": "stacked", "cadm": "encoder"}[
            self.model
        ]
        model = Dynamics(
            DynamicsConfig(
                obs_dim=env.obs_dim,
                act_dim=env.act_dim,
                hidden=self.hidden,
                n_members=self.ensemble,
                probabilistic=(self.ensemble > 1 if self.probabilistic is None
                               else self.probabilistic),
                context=context,
                z_dim=self.z_dim,
                history_k=self.history_k,
                future_m=self.future_m,
                beta_backward=self.beta_backward,
                lr=self.lr,
                mean_anchor=self.mean_anchor,
                detach_logvar_trunk=self.detach_logvar_trunk,
            )
        )
        trainer = PPOTrainer(
            env,
            model,
            PPOConfig(
                n_envs=self.n_envs,
                rollout_len=self.rollout_len,
                n_itr=self.n_itr,
                policy_hidden=self.policy_hidden,
                lr=self.ppo_lr,
                ppo_epochs=self.ppo_epochs,
                minibatches=self.ppo_minibatches,
                model_updates_per_itr=self.model_updates_per_itr,
                model_batch=self.batch_size,
                buffer_capacity=self.buffer_capacity,
                eval_envs=self.eval_envs,
                eval_modes=self.eval_modes,
            ),
            mesh=mesh,
        )
        return env, model, None, trainer

    def _build_grbal(self, env, mesh):
        from cadm_tpu.models.grbal import GrBAL, GrBALConfig
        from cadm_tpu.planners.grbal_mpc import GrBALPlanner

        model = GrBAL(
            GrBALConfig(
                obs_dim=env.obs_dim,
                act_dim=env.act_dim,
                hidden=self.hidden[:3],
                history_k=self.history_k,
                future_m=self.future_m,
                lr=self.lr,
            )
        )
        planner = GrBALPlanner(
            PlannerConfig(
                kind=self.planner,
                horizon=self.plan_horizon,
                n_candidates=self.n_candidates,
                cem_iters=self.cem_iters,
                cem_elites=self.cem_elites,
                warm_start=self.warm_start,
                max_parallel_rollouts=self.max_parallel_rollouts,
            ),
            model,
            env.reward,
            env.act_dim,
            # env-defined blowup limits terminate+penalize exploding MODEL
            # rollouts (inf on analytic envs = guard statically off)
            bad_transition_fn=env.bad_transition,
            obs_limit=env.bad_obs_limit,
        )
        trainer = MBTrainer(
            env, model, planner,
            TrainerConfig(
                n_envs=self.n_envs,
                steps_per_itr=self.steps_per_itr,
                n_itr=self.n_itr,
                model_updates_per_itr=self.model_updates_per_itr,
                batch_size=self.batch_size,
                buffer_capacity=self.buffer_capacity,
                eval_envs=self.eval_envs,
                eval_modes=self.eval_modes,
                eval_every=self.eval_every,
                fit_protocol=self.fit_protocol,
                max_epochs=self.max_epochs,
                early_stop_patience=self.early_stop_patience,
                early_stop_metric=self.early_stop_metric,
                epoch_updates_cap=self.epoch_updates_cap,
            ),
            mesh=mesh,
        )
        return env, model, planner, trainer


# --- the five driver configs (BASELINE.json "configs" [B:7–11]) -------------
PRESETS = {
    # CartPole, randomized force/length, vanilla DM + RS-MPC (CPU-runnable)
    "cartpole_vanilla_rs": ExperimentConfig(
        env="cartpole", model="vanilla", planner="rs",
        n_envs=8, n_candidates=500, plan_horizon=20, history_k=10, future_m=5,
        steps_per_itr=210, n_itr=15,
    ),
    # Pendulum, randomized mass/length, CaDM encoder + CEM-MPC
    "pendulum_cadm_cem": ExperimentConfig(
        env="pendulum", model="cadm", planner="cem", fit_protocol="epochs",
        n_envs=8, n_candidates=200, plan_horizon=20,
        steps_per_itr=210, n_itr=15,
    ),
    # HalfCheetah, randomized mass/damping, CaDM fwd+bwd + CEM @ 2048 envs
    "halfcheetah_cadm_cem": ExperimentConfig(
        env="half_cheetah", model="cadm", planner="cem", fit_protocol="epochs",
        n_envs=2048, n_candidates=200, plan_horizon=30,
        steps_per_itr=1000, n_itr=20, buffer_capacity=20000,
        model_updates_per_itr=2000, batch_size=256,
    ),
    # Ant + CrippledAnt, CaDM ensemble + CEM
    "ant_cadm_ensemble_cem": ExperimentConfig(
        env="ant", model="cadm", ensemble=5, planner="cem", fit_protocol="epochs",
        n_envs=1024, n_candidates=200, plan_horizon=30,
        steps_per_itr=1000, n_itr=20, buffer_capacity=20000,
        model_updates_per_itr=2000, batch_size=256,
    ),
    "cripple_ant_cadm_ensemble_cem": ExperimentConfig(
        env="cripple_ant", model="cadm", ensemble=5, planner="cem", fit_protocol="epochs",
        n_envs=1024, n_candidates=200, plan_horizon=30,
        steps_per_itr=1000, n_itr=20, buffer_capacity=20000,
        model_updates_per_itr=2000, batch_size=256,
    ),
    # SlimHumanoid / Hopper model-based configs (PPO+CaDM: --trainer ppo)
    "slim_humanoid_cadm_cem": ExperimentConfig(
        env="slim_humanoid", model="cadm", planner="cem", fit_protocol="epochs",
        n_envs=512, n_candidates=200, plan_horizon=30,
        steps_per_itr=500, n_itr=20, buffer_capacity=10000,
        model_updates_per_itr=2000, batch_size=256,
    ),
    "hopper_cadm_cem": ExperimentConfig(
        env="hopper", model="cadm", planner="cem", fit_protocol="epochs",
        n_envs=512, n_candidates=200, plan_horizon=30,
        steps_per_itr=500, n_itr=20, buffer_capacity=10000,
        model_updates_per_itr=2000, batch_size=256,
    ),
    # PPO+CaDM (paper §4.3): policy on concat(obs, z), shifted-range eval
    "hopper_ppo_cadm": ExperimentConfig(
        trainer="ppo", env="hopper", model="cadm",
        n_envs=128, rollout_len=256, n_itr=60,
        model_updates_per_itr=200, batch_size=256, buffer_capacity=4096,
        eval_envs=16,
    ),
    "slim_humanoid_ppo_cadm": ExperimentConfig(
        trainer="ppo", env="slim_humanoid", model="cadm",
        n_envs=128, rollout_len=256, n_itr=60,
        model_updates_per_itr=200, batch_size=256, buffer_capacity=4096,
        eval_envs=16,
    ),
}
