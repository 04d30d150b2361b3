"""Deterministic full-state checkpoint/resume (VERDICT r1 item 3).

The reference snapshots model+policy per itr (SURVEY §5); the rebuild saves
the FULL training pytree — dyn_state, replay buffer, env states, history
rings, rng — so a resumed run reproduces the exact metrics trajectory of an
uninterrupted run.
"""
import jax
import numpy as np
import pytest

from cadm_tpu.envs.cartpole import CartPoleEnv
from cadm_tpu.models.dynamics import Dynamics, DynamicsConfig
from cadm_tpu.planners.mpc import MPCPlanner, PlannerConfig
from cadm_tpu.train.mb_trainer import MBTrainer, TrainerConfig
from cadm_tpu.utils.checkpoint import Checkpointer


def _make_trainer():
    env = CartPoleEnv()
    model = Dynamics(
        DynamicsConfig(
            obs_dim=env.obs_dim, act_dim=env.act_dim, hidden=(32, 32),
            history_k=4, future_m=2, lr=3e-3,
        )
    )
    planner = MPCPlanner(
        PlannerConfig(kind="rs", horizon=5, n_candidates=32),
        model, env.reward, env.act_dim,
    )
    return MBTrainer(
        env, model, planner,
        TrainerConfig(
            n_envs=4, steps_per_itr=64, n_itr=4, model_updates_per_itr=40,
            batch_size=64, buffer_capacity=512, eval_envs=2, eval_modes=(0,),
        ),
    )


NUMERIC = lambda m: {k: v for k, v in m.items() if isinstance(v, float)}


def test_resume_reproduces_uninterrupted_metrics(tmp_path):
    # uninterrupted 4-itr run, checkpointing every itr
    trainer = _make_trainer()
    ckpt = Checkpointer(str(tmp_path / "ck"), keep=5)
    _, full_history = trainer.train(jax.random.key(7), checkpointer=ckpt)
    ckpt.close()
    assert len(full_history) == 4

    # resume from the end-of-itr-1 checkpoint; expect itrs 2..3 to match
    trainer2 = _make_trainer()
    ckpt2 = Checkpointer(str(tmp_path / "ck"), keep=5)
    restored = ckpt2.restore(step=1, template=trainer2.resume_template())
    restored["itr"] = 1
    _, resumed_history = trainer2.train(jax.random.key(123), resume=restored)
    ckpt2.close()

    assert [m["itr"] for m in resumed_history] == [2, 3]
    for resumed, original in zip(resumed_history, full_history[2:]):
        r, o = NUMERIC(resumed), NUMERIC(original)
        assert r.keys() == o.keys()
        for k in r:
            np.testing.assert_allclose(
                r[k], o[k], rtol=0, atol=0,
                err_msg=f"metric {k} diverged after resume",
            )


def test_resume_template_shapes_roundtrip(tmp_path):
    trainer = _make_trainer()
    env_states, hists, buffer, dyn_state = trainer.init(jax.random.key(0))
    payload = trainer.checkpoint_payload(
        env_states, hists, buffer, dyn_state, jax.random.key(5)
    )
    ckpt = Checkpointer(str(tmp_path / "ck2"))
    ckpt.save(0, payload, wait=True)
    restored = ckpt.restore(step=0, template=trainer.resume_template())
    ckpt.close()
    def as_np(x):
        x = jax.numpy.asarray(x)
        if jax.dtypes.issubdtype(x.dtype, jax.dtypes.prng_key):
            x = jax.random.key_data(x)
        return np.asarray(x)

    for a, b in zip(jax.tree.leaves(payload), jax.tree.leaves(restored)):
        np.testing.assert_array_equal(as_np(a), as_np(b))
