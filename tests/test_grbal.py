"""GrBAL meta-model: adaptation must beat the unadapted prior on a family
of hidden-parameter dynamics (the meta-learning premise)."""
import jax
import jax.numpy as jnp
import numpy as np

from cadm_tpu.models.grbal import GrBAL, GrBALConfig
from tests.test_models import synthetic_batch, OBS, ACT, K, M


def test_grbal_adaptation_helps():
    cfg = GrBALConfig(
        obs_dim=OBS, act_dim=ACT, hidden=(64, 64), history_k=K, future_m=M,
        inner_lr=0.05, inner_steps=1, lr=1e-3,
    )
    model = GrBAL(cfg)
    state = model.init_state(jax.random.key(0))
    upd = jax.jit(model.update)
    gen = jax.jit(lambda k: synthetic_batch(k, 64)[0])
    first = None
    for i in range(200):
        state, metrics = upd(state, gen(jax.random.key(i)))
        if first is None:
            first = float(metrics["model_loss"])
    final = float(metrics["model_loss"])
    assert final < first * 0.5, (first, final)

    # post-adaptation prediction beats prior-parameter prediction
    b = gen(jax.random.key(777))

    def seg_losses(bseg):
        net0 = state.params["net"]
        net_ad = model.adapt(
            state.params, state.norm,
            bseg.hist_obs, bseg.hist_act, bseg.hist_dobs, bseg.hist_valid,
        )
        dobs = bseg.next_obs - bseg.obs
        l0 = model._pred_loss(
            net0, state.norm, bseg.obs, bseg.act, dobs, bseg.valid
        )
        l1 = model._pred_loss(
            net_ad, state.norm, bseg.obs, bseg.act, dobs, bseg.valid
        )
        return l0, l1

    l0, l1 = jax.vmap(seg_losses)(b)
    assert float(l1.mean()) < float(l0.mean()), (
        float(l0.mean()), float(l1.mean())
    )


def test_grbal_full_trainer_loop():
    """GrBAL as the trainer's model: adaptation context + MPC end-to-end."""
    import numpy as np
    from cadm_tpu.envs.cartpole import CartPoleEnv
    from cadm_tpu.planners.grbal_mpc import GrBALPlanner
    from cadm_tpu.planners.mpc import PlannerConfig
    from cadm_tpu.train.mb_trainer import MBTrainer, TrainerConfig

    env = CartPoleEnv()
    model = GrBAL(
        GrBALConfig(
            obs_dim=env.obs_dim, act_dim=env.act_dim, hidden=(32, 32),
            history_k=5, future_m=3, inner_lr=0.02, lr=3e-3,
        )
    )
    planner = GrBALPlanner(
        PlannerConfig(kind="cem", horizon=6, n_candidates=24, cem_iters=2,
                      cem_elites=6),
        model, env.reward, env.act_dim,
    )
    trainer = MBTrainer(
        env, model, planner,
        TrainerConfig(
            n_envs=4, steps_per_itr=120, n_itr=2, model_updates_per_itr=40,
            batch_size=32, buffer_capacity=300, eval_envs=4, eval_modes=(0,),
        ),
    )
    dyn_state, history = trainer.train(jax.random.key(0))
    assert len(history) == 2
    assert np.isfinite(history[-1]["fit/model_loss_last"])
    assert np.isfinite(history[-1]["eval/return_mode0"])


def test_grbal_planner_blowup_guard():
    """The GrBAL planner shares the MPC blowup guard: an adapted net whose
    predictions explode must yield finite, penalized candidate returns
    (same failure class as the TS1 ensemble case, VERDICT r3 weak #2)."""
    from cadm_tpu.planners.grbal_mpc import GrBALPlanner
    from cadm_tpu.planners.mpc import PlannerConfig

    class StubModel:
        def predict(self, z, norm, obs, act):
            # geometric explosion: doubles per step from a large base
            return obs * 2.0 + 100.0

    def bad(o, no):
        return (jnp.abs(no).max(axis=-1) > 150.0) | (
            jnp.abs(no - o).max(axis=-1) > 100.0
        )

    reward = lambda o, a, no: no[..., 0]
    cfg = PlannerConfig(kind="rs", horizon=10, n_candidates=8)
    guarded = GrBALPlanner(cfg, StubModel(), reward, 1,
                           bad_transition_fn=bad, obs_limit=150.0)
    unguarded = GrBALPlanner(cfg, StubModel(), reward, 1)
    acts = jnp.zeros((8, 10, 1))
    obs0 = jnp.zeros((2,))
    r_g = guarded._evaluate(None, None, obs0, None, acts, jax.random.key(0))
    r_u = unguarded._evaluate(None, None, obs0, None, acts, jax.random.key(0))
    assert bool(jnp.isfinite(r_g).all())
    # blown at step 1 (dobs=100 hits the dobs limit... at step 2 obs=300):
    # one honest step of reward, then the one-time penalty, then zeros
    assert float(r_g.max()) < 0.0
    # the unguarded stub grows 2^10 * 100 ≈ 1e5 reward — the exploit the
    # guard exists to kill
    assert float(r_u.min()) > 1e4
