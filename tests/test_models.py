"""Dynamics-model zoo tests (SURVEY.md §4.3).

Checks: loss decreases on a synthetic linear system for every model variant;
the CaDM context encoder recovers a hidden per-trajectory parameter (the
paper's probing analysis, arXiv:2005.06800 §5.3); probabilistic heads respect
logvar bounds.
"""
import dataclasses

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from cadm_tpu.models.dynamics import (
    Dynamics,
    DynamicsConfig,
    NormStats,
    SegmentBatch,
)

OBS, ACT, K, M = 3, 2, 4, 3


def synthetic_batch(rng, n, a_scale=None):
    """Segments from x' = x + 0.5·(a_scale ⊙ u)·B: hidden scale per segment.

    The hidden per-trajectory action gain spans [0.25, 2.0], so a model
    without context pays a large irreducible error — the context path has a
    strong incentive to infer it from the history window (the CaDM premise).
    """
    r1, r2, r3 = jax.random.split(rng, 3)
    if a_scale is None:
        a_scale = jax.random.uniform(r1, (n, 1, 1), minval=0.25, maxval=2.0)
    B = jax.random.normal(r2, (OBS, ACT)) * 0.0 + jnp.eye(OBS, ACT)

    def gen(key, scale):
        ko, ka = jax.random.split(key)
        obs0 = jax.random.normal(ko, (OBS,))
        acts = jax.random.uniform(ka, (K + M, ACT), minval=-1, maxval=1)

        def step(x, u):
            x2 = x + 0.5 * (scale[0] * u) @ B.T
            return x2, (x, u, x2)

        _, (xs, us, x2s) = jax.lax.scan(step, obs0, acts)
        return xs, us, x2s

    keys = jax.random.split(r3, n)
    xs, us, x2s = jax.vmap(gen)(keys, a_scale)
    return (
        SegmentBatch(
            hist_obs=xs[:, :K],
            hist_dobs=x2s[:, :K] - xs[:, :K],
            hist_act=us[:, :K],
            hist_valid=jnp.ones((n, K)),
            obs=xs[:, K:],
            act=us[:, K:],
            next_obs=x2s[:, K:],
            valid=jnp.ones((n, M)),
        ),
        a_scale[:, 0, 0],
    )


VARIANTS = {
    "vanilla": dict(),
    "stacked": dict(context="stacked"),
    "cadm": dict(context="encoder"),
    "rnn": dict(context="rnn"),
    "pets": dict(n_members=3, probabilistic=True),
    "cadm_pets": dict(context="encoder", n_members=3, probabilistic=True),
}


@pytest.mark.parametrize("variant", list(VARIANTS))
def test_loss_decreases(variant):
    cfg = DynamicsConfig(
        obs_dim=OBS, act_dim=ACT, hidden=(64, 64), history_k=K, future_m=M,
        encoder_hidden=(32,), z_dim=4, lr=3e-3, **VARIANTS[variant],
    )
    model = Dynamics(cfg)
    state = model.init_state(jax.random.key(0))

    upd = jax.jit(model.update)
    gen = jax.jit(lambda k: synthetic_batch(k, 64)[0])

    first_loss = None
    state_n = state
    for i in range(60):
        b = gen(jax.random.key(i + 1))
        mb = jax.tree.map(
            lambda x: jnp.broadcast_to(x, (cfg.n_members, *x.shape)), b
        )
        state_n, metrics = upd(state_n, mb)
        if first_loss is None:
            first_loss = float(metrics["model_loss"])
    final = float(metrics["model_loss"])
    assert final < first_loss * 0.7, (variant, first_loss, final)


def test_context_encoder_recovers_hidden_param():
    cfg = DynamicsConfig(
        obs_dim=OBS, act_dim=ACT, hidden=(64, 64), history_k=K, future_m=M,
        encoder_hidden=(64,), z_dim=4, context="encoder", lr=3e-3,
    )
    model = Dynamics(cfg)
    state = model.init_state(jax.random.key(0))
    upd = jax.jit(model.update)
    gen = jax.jit(lambda k: synthetic_batch(k, 128)[0])
    for i in range(300):
        mb = jax.tree.map(lambda x: x[None], gen(jax.random.key(i)))
        state, _ = upd(state, mb)

    # Probe: z should linearly decode the hidden action scale.
    b, scales = synthetic_batch(jax.random.key(9999), 512)
    z = model.get_context(
        state.params, state.norm, b.hist_dobs, b.hist_act, b.hist_valid
    )
    Z = np.c_[np.asarray(z), np.ones(len(scales))]
    y = np.asarray(scales)
    coef, *_ = np.linalg.lstsq(Z, y, rcond=None)
    pred = Z @ coef
    r2 = 1 - ((pred - y) ** 2).sum() / ((y - y.mean()) ** 2).sum()
    assert r2 > 0.5, r2


def test_probabilistic_logvar_bounds():
    cfg = DynamicsConfig(
        obs_dim=OBS, act_dim=ACT, hidden=(32,), probabilistic=True, n_members=2
    )
    model = Dynamics(cfg)
    params = model.init_params(jax.random.key(0))
    norm = NormStats.identity(OBS, ACT)
    obs = jnp.zeros((5, OBS))
    act = jnp.zeros((5, ACT))
    z = jnp.zeros((5, 0))
    mean, logvar = model._head_out(
        jax.tree.map(lambda x: x[0], params["fwd"]), params, norm, obs, act, z
    )
    assert mean.shape == (5, OBS)
    assert bool((logvar <= params["max_logvar"] + 1e-4).all())
    assert bool((logvar >= params["min_logvar"] - 1e-4).all())


def test_predict_deterministic_vs_sampled():
    cfg = DynamicsConfig(
        obs_dim=OBS, act_dim=ACT, hidden=(32,), probabilistic=True, n_members=1
    )
    model = Dynamics(cfg)
    params = model.init_params(jax.random.key(0))
    norm = NormStats.identity(OBS, ACT)
    fwd0 = jax.tree.map(lambda x: x[0], params["fwd"])
    obs, act, z = jnp.ones((OBS,)), jnp.ones((ACT,)), jnp.zeros((0,))
    det = model.predict(params, norm, fwd0, obs, act, z, rng=None)
    s1 = model.predict(params, norm, fwd0, obs, act, z, jax.random.key(1))
    s2 = model.predict(params, norm, fwd0, obs, act, z, jax.random.key(2))
    assert det.shape == (OBS,)
    assert not np.allclose(np.asarray(s1), np.asarray(s2))


def test_mean_anchor_keeps_mean_gradient_alive():
    """The anchor restores mean training when the variance head saturates.

    Round-4 pets_cadm fix: with logvars pinned at their max bound the NLL's
    mean gradient is exp(-logvar)-suppressed; the anchor term adds an
    unsuppressed unit-weight MSE path. Check (a) loss decomposition:
    anchored loss == plain NLL + anchor·Σ(mean-target)², and (b) the mean
    gradient norm grows with the anchor under inflated variance.
    """
    cfg0 = DynamicsConfig(
        obs_dim=OBS, act_dim=ACT, hidden=(16,), probabilistic=True,
        n_members=2, mean_anchor=0.0, backward=False,
    )
    cfg1 = dataclasses.replace(cfg0, mean_anchor=1.0)
    m0, m1 = Dynamics(cfg0), Dynamics(cfg1)
    params = m0.init_params(jax.random.key(0))
    # inflate variance: pin logvar bounds so every head is maximally unsure
    params["min_logvar"] = jnp.full((OBS,), 6.0)
    params["max_logvar"] = jnp.full((OBS,), 6.0)
    norm = NormStats.identity(OBS, ACT)
    batch, _ = synthetic_batch(jax.random.key(1), 8)
    mb = jax.tree.map(lambda x: jnp.stack([x, x]), batch)

    l0, met0 = m0.loss(params, norm, mb)
    l1, _ = m1.loss(params, norm, mb)
    # exact decomposition: the decoupled loss VALUE equals the plain NLL
    # plus mean_anchor * the summed-over-dims mean MSE (stop_gradient only
    # changes gradients, not values). metrics['fwd_mean_mse'] is the
    # per-dim MEAN of the same weighted error, so x OBS recovers the sum.
    expected_anchor_term = 1.0 * OBS * float(met0["fwd_mean_mse"])
    assert np.isclose(float(l1), float(l0) + expected_anchor_term, rtol=1e-5)

    def mean_grad_norm(model):
        g = jax.grad(lambda p: model.loss(p, norm, mb)[0])(params)
        leaves = jax.tree.leaves(g["fwd"])
        return float(sum(jnp.sum(x**2) for x in leaves))

    g0, g1 = mean_grad_norm(m0), mean_grad_norm(m1)
    # at var = e^6 the NLL mean gradient is ~exp(-6) suppressed; the anchored
    # gradient must be orders of magnitude larger
    assert g1 > 10.0 * g0


def test_detach_logvar_trunk_value_identical_gradient_isolated():
    """detach_logvar_trunk must not change any VALUE (mean or logvar) and
    must block exactly the logvar->trunk gradient path."""
    cfg0 = DynamicsConfig(
        obs_dim=OBS, act_dim=ACT, hidden=(16, 16), probabilistic=True,
        n_members=1, backward=False,
    )
    cfg1 = dataclasses.replace(cfg0, detach_logvar_trunk=True)
    m0, m1 = Dynamics(cfg0), Dynamics(cfg1)
    params = m0.init_params(jax.random.key(0))
    norm = NormStats.identity(OBS, ACT)
    obs = jax.random.normal(jax.random.key(1), (7, OBS))
    act = jax.random.normal(jax.random.key(2), (7, ACT))
    z = jnp.zeros((7, 0))
    fwd0 = jax.tree.map(lambda x: x[0], params["fwd"])

    mean0, lv0 = m0._head_out(fwd0, params, norm, obs, act, z)
    mean1, lv1 = m1._head_out(fwd0, params, norm, obs, act, z)
    assert np.allclose(np.asarray(mean0), np.asarray(mean1), atol=1e-6)
    assert np.allclose(np.asarray(lv0), np.asarray(lv1), atol=1e-6)

    def logvar_sum(model):
        def f(p):
            fwd = jax.tree.map(lambda x: x[0], p["fwd"])
            _, lv = model._head_out(fwd, p, norm, obs, act, z)
            return jnp.sum(lv)
        return jax.grad(f)(params)

    g0, g1 = logvar_sum(m0), logvar_sum(m1)
    # detach: zero logvar gradient into every trunk (non-final) layer...
    for layer in g1["fwd"][:-1]:
        assert float(jnp.abs(layer["w"]).max()) == 0.0
    # ...but the fused head DOES leak logvar gradient into the trunk
    assert float(jnp.abs(g0["fwd"][0]["w"]).max()) > 0.0
    # the final layer's logvar columns still train under detach
    assert float(jnp.abs(g1["fwd"][-1]["w"][..., OBS:]).max()) > 0.0
    # and its mean columns receive no gradient from a logvar-only loss
    assert float(jnp.abs(g1["fwd"][-1]["w"][..., :OBS]).max()) == 0.0
