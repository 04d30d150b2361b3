"""Episode-recurrent ReBAL (VERDICT r1 item 5).

The RNN context must be EPISODE-recurrent: the GRU hidden state carried in
History.rnn_h integrates the whole trajectory (SURVEY §2.1 "RNN dynamics"),
not just the K-window. Two tests:

1. mechanism — the acting context depends on transitions OLDER than K
   (impossible for the window encoder by construction);
2. learning — on a task whose hidden param is revealed only in a burst at
   episode start, the recurrent model beats the window encoder at anchors
   more than K steps past the burst.
"""
import dataclasses

import jax
import jax.numpy as jnp
import numpy as np

from cadm_tpu.core.types import batched_history
from cadm_tpu.models.dynamics import (
    Dynamics,
    DynamicsConfig,
    NormStats,
    SegmentBatch,
)

K = 6


def _push_seq(model, state, hists, dobs_seq, act_seq):
    """Push a (T, B, ...) sequence of transitions through push_history."""
    obs = jnp.zeros_like(dobs_seq[0])
    for t in range(dobs_seq.shape[0]):
        hists = model.push_history(
            state.params, state.norm, hists, obs, dobs_seq[t], act_seq[t]
        )
        obs = obs + dobs_seq[t]
    return hists


def test_rnn_context_is_episode_recurrent():
    cfg = DynamicsConfig(
        obs_dim=2, act_dim=1, hidden=(16,), context="rnn", z_dim=4,
        rnn_hidden=8, history_k=K, future_m=1,
    )
    model = Dynamics(cfg)
    state = model.init_state(jax.random.key(0))
    T, B = 3 * K, 2

    # two histories identical in the last K transitions, different earlier
    rng = np.random.RandomState(0)
    tail = rng.randn(K, B, 2).astype(np.float32)
    head_a = rng.randn(T - K, B, 2).astype(np.float32)
    head_b = rng.randn(T - K, B, 2).astype(np.float32)
    acts = rng.randn(T, B, 1).astype(np.float32)

    def ctx(head):
        hists = batched_history(cfg, B)
        dobs = jnp.asarray(np.concatenate([head, tail], axis=0))
        h = _push_seq(model, state, hists, dobs, jnp.asarray(acts))
        return model.context_from_history(state.params, state.norm, h)

    za, zb = ctx(head_a), ctx(head_b)
    assert float(jnp.abs(za - zb).max()) > 1e-5, (
        "rnn context ignored transitions older than K — window-recurrent"
    )

    # the window encoder, by construction, cannot see past K
    cfg_w = dataclasses.replace(cfg, context="encoder")
    model_w = Dynamics(cfg_w)
    state_w = model_w.init_state(jax.random.key(0))

    def ctx_w(head):
        hists = batched_history(cfg_w, B)
        dobs = jnp.asarray(np.concatenate([head, tail], axis=0))
        h = _push_seq(model_w, state_w, hists, dobs, jnp.asarray(acts))
        return model_w.context_from_history(state_w.params, state_w.norm, h)

    np.testing.assert_allclose(
        np.asarray(ctx_w(head_a)), np.asarray(ctx_w(head_b)), atol=1e-6
    )


# ---------------------------------------------------------------------------
# Learning test: burst task. θ ~ U(-1,1) is revealed ONLY at t<2 via
# dobs[0] = θ; afterwards dobs[1] = θ·a_t with sparse actions. At eval the
# window preceding the anchor is all-quiet (a=0, dobs=0), so the window
# encoder has zero information while the carried hidden state remembers θ.
# ---------------------------------------------------------------------------
T_EP = 16
EVAL_T = 13  # anchor with 11 quiet steps since the burst (> K)


def _gen_episodes(rng, n, sparse_p=0.25):
    theta = rng.uniform(-1.0, 1.0, size=(n, 1)).astype(np.float32)
    act = (rng.uniform(size=(n, T_EP, 1)) < sparse_p) * np.sign(
        rng.randn(n, T_EP, 1)
    )
    act = act.astype(np.float32)
    act[:, :2] = 0.0
    dobs = np.zeros((n, T_EP, 2), np.float32)
    dobs[:, :2, 0] = theta  # the burst
    dobs[:, 2:, 1] = theta[:, None, 0] * act[:, 2:, 0]
    obs = np.concatenate(
        [np.zeros((n, 1, 2), np.float32), np.cumsum(dobs, axis=1)], axis=1
    )
    return theta, obs, act, dobs


def _batch_from_anchors(obs, act, dobs, ep_idx, t_idx):
    """SegmentBatch (1-member) with K-history windows and M=1 futures."""
    B = len(ep_idx)
    offs = np.arange(-K, 0)
    h_t = t_idx[:, None] + offs
    valid = (h_t >= 0).astype(np.float32)
    h_tc = np.clip(h_t, 0, T_EP - 1)
    gi = ep_idx[:, None]
    return SegmentBatch(
        hist_obs=jnp.asarray(obs[gi, h_tc])[None],
        hist_dobs=jnp.asarray(dobs[gi, h_tc] * valid[..., None])[None],
        hist_act=jnp.asarray(act[gi, h_tc] * valid[..., None])[None],
        hist_valid=jnp.asarray(valid)[None],
        obs=jnp.asarray(obs[ep_idx, t_idx])[None, :, None],
        act=jnp.asarray(act[ep_idx, t_idx])[None, :, None],
        next_obs=jnp.asarray(obs[ep_idx, t_idx + 1])[None, :, None],
        valid=jnp.ones((1, B, 1)),
    )


def _train(context):
    cfg = DynamicsConfig(
        obs_dim=2, act_dim=1, hidden=(32, 32), context=context, z_dim=4,
        rnn_hidden=16, history_k=K, future_m=1, lr=3e-3, backward=False,
    )
    model = Dynamics(cfg)
    state = model.init_state(jax.random.key(1))
    rng = np.random.RandomState(42)
    theta, obs, act, dobs = _gen_episodes(rng, 1024)
    norm = NormStats(
        obs_mean=jnp.asarray(obs.reshape(-1, 2).mean(0)),
        obs_std=jnp.asarray(obs.reshape(-1, 2).std(0) + 1e-3),
        act_mean=jnp.zeros((1,)),
        act_std=jnp.ones((1,)),
        dobs_mean=jnp.asarray(dobs.reshape(-1, 2).mean(0)),
        dobs_std=jnp.asarray(dobs.reshape(-1, 2).std(0) + 1e-3),
    )
    state = dataclasses.replace(state, norm=norm)

    upd = jax.jit(model.update)
    for step in range(500):
        ep = rng.randint(0, 1024, size=256)
        ts = rng.randint(1, T_EP - 1, size=256)
        state, _ = upd(state, _batch_from_anchors(obs, act, dobs, ep, ts))
    return cfg, model, state


def _eval_mse(cfg, model, state):
    """One-step prediction MSE at a quiet-window anchor with active action."""
    rng = np.random.RandomState(7)
    theta, obs, act, dobs = _gen_episodes(rng, 256, sparse_p=0.0)
    # probe action at the anchor; target dobs = (0, θ)
    a_probe = np.ones((256, 1), np.float32)

    hists = batched_history(cfg, 256)
    h = hists
    o = jnp.zeros((256, 2))
    for t in range(EVAL_T):
        h = model.push_history(
            state.params, state.norm, h,
            jnp.asarray(obs[:, t]), jnp.asarray(dobs[:, t]), jnp.asarray(act[:, t]),
        )
    z = model.context_from_history(state.params, state.norm, h)
    member0 = jax.tree.map(lambda x: x[0], state.params["fwd"])
    pred = model.predict(
        state.params, state.norm, member0,
        jnp.asarray(obs[:, EVAL_T]), jnp.asarray(a_probe), z,
    )
    target = obs[:, EVAL_T] + np.concatenate(
        [np.zeros_like(theta), theta], axis=1
    )
    return float(((np.asarray(pred) - target) ** 2).mean())


def test_recurrent_beats_window_encoder_beyond_k():
    mse = {}
    for context in ("rnn", "encoder"):
        cfg, model, state = _train(context)
        mse[context] = _eval_mse(cfg, model, state)
    # window encoder sees an all-quiet window: cannot know θ; best it can do
    # is predict 0, giving MSE ≈ E[θ²] = 1/3. The recurrent model carried θ
    # from the burst across > K quiet steps.
    assert mse["rnn"] < 0.6 * mse["encoder"], mse
    assert mse["rnn"] < 0.15, mse
