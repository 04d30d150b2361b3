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
