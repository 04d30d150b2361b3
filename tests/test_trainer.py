"""Integration test (SURVEY.md §4.5): CartPole + vanilla model + RS-MPC
end-to-end on CPU — the reference driver's config[0] in miniature."""
import jax
import jax.numpy as jnp
import numpy as np

from cadm_tpu.envs.cartpole import CartPoleEnv
from cadm_tpu.models.dynamics import Dynamics, DynamicsConfig
from cadm_tpu.planners.mpc import MPCPlanner, PlannerConfig
from cadm_tpu.train.mb_trainer import MBTrainer, TrainerConfig


def test_mb_trainer_end_to_end_cartpole():
    env = CartPoleEnv()
    model = Dynamics(
        DynamicsConfig(
            obs_dim=env.obs_dim, act_dim=env.act_dim, hidden=(64, 64),
            history_k=5, future_m=3, lr=3e-3,
        )
    )
    planner = MPCPlanner(
        PlannerConfig(kind="rs", horizon=8, n_candidates=64),
        model, env.reward, env.act_dim,
    )
    trainer = MBTrainer(
        env, model, planner,
        TrainerConfig(
            n_envs=4, steps_per_itr=220, n_itr=3, model_updates_per_itr=150,
            batch_size=64, buffer_capacity=1024, eval_envs=4,
            eval_modes=(0,),
        ),
    )
    dyn_state, history = trainer.train(jax.random.key(0))

    assert len(history) == 3
    for m in history:
        assert np.isfinite(m["fit/model_loss_mean"])
    # model improves across iterations (first-itr loss vs last-itr loss)
    assert history[-1]["fit/model_loss_last"] < history[0]["fit/model_loss_first"]
    # every itr completes at least one episode per env (horizon 200 < 220)
    assert history[0]["collect/episodes"] >= 4
    assert np.isfinite(history[-1]["eval/return_mode0"])
    # norm stats were fitted (not identity)
    assert float(jnp.abs(dyn_state.norm.obs_std - 1.0).max()) > 1e-3


def test_epoch_fit_protocol_early_stops():
    """Reference fit protocol: epoch passes + early stop on valid loss
    (SURVEY §3.3). The epoch count must be dynamic (early stop fires) and
    the model must still learn."""
    env = CartPoleEnv()
    model = Dynamics(
        DynamicsConfig(
            obs_dim=env.obs_dim, act_dim=env.act_dim, hidden=(32, 32),
            history_k=3, future_m=2, lr=3e-3,
        )
    )
    planner = MPCPlanner(
        PlannerConfig(kind="rs", horizon=5, n_candidates=32),
        model, env.reward, env.act_dim,
    )
    trainer = MBTrainer(
        env, model, planner,
        TrainerConfig(
            n_envs=4, steps_per_itr=64, n_itr=2, batch_size=64,
            buffer_capacity=256, eval_envs=2, eval_modes=(0,),
            fit_protocol="epochs", max_epochs=25, early_stop_patience=1,
            min_rel_improve=3e-2, valid_batches=2,
        ),
    )
    dyn_state, history = trainer.train(jax.random.key(1))
    for m in history:
        assert np.isfinite(m["fit/model_loss_mean"])
        assert 1 <= m["fit/epochs_run"] <= 25
        # valid loss after fit should not exceed the pre-fit valid loss
        assert m["fit/valid_loss_after"] <= m["fit/valid_loss_before"] + 1e-6
    # early stopping engaged at least once across itrs (tiny dataset
    # plateaus quickly) — otherwise the cap is doing all the work
    assert min(m["fit/epochs_run"] for m in history) < 25
