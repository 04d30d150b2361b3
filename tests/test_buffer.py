"""Replay-buffer segment sampling: validity masks at episode boundaries."""
import jax
import jax.numpy as jnp
import numpy as np

from cadm_tpu.train.buffer import ReplayBuffer, masked_mean_std


def _fill(buf, n_steps, horizon):
    """Write a deterministic stream: obs value encodes (env, global_t)."""
    for t in range(n_steps):
        ep_step = jnp.full((buf.n_envs,), t % horizon, jnp.int32)
        done = jnp.full((buf.n_envs,), (t % horizon) == horizon - 1)
        obs = jnp.full((buf.n_envs, 1), float(t))
        buf = buf.append(obs, obs[:, :1] * 0 + 1.0, obs + 0.5, done, ep_step)
    return buf


def test_history_mask_respects_episode_start():
    horizon, k, m = 10, 4, 3
    buf = ReplayBuffer.create(n_envs=2, capacity=64, obs_dim=1, act_dim=1)
    buf = _fill(buf, 25, horizon)

    # Sample many segments; wherever the anchor's ep_step < k, some history
    # slots must be masked out; valid count == min(ep_step, k).
    batch = buf.sample_segments(jax.random.key(0), (256,), k, m)
    es0 = np.asarray(batch.obs[:, 0, 0]) % horizon  # obs encodes global t
    hist_count = np.asarray(batch.hist_valid.sum(-1))
    np.testing.assert_array_equal(hist_count, np.minimum(es0, k))


def test_future_mask_stops_at_episode_end():
    horizon, k, m = 10, 2, 5
    buf = ReplayBuffer.create(n_envs=1, capacity=64, obs_dim=1, act_dim=1)
    buf = _fill(buf, 20, horizon)
    batch = buf.sample_segments(jax.random.key(1), (512,), k, m)
    es0 = np.asarray(batch.obs[:, 0, 0]) % horizon
    fut_count = np.asarray(batch.valid.sum(-1))
    # future window truncates at the episode boundary (and at buffer head)
    glob_t = np.asarray(batch.obs[:, 0, 0])
    max_by_episode = np.minimum(horizon - es0, m)
    max_by_buffer = np.minimum(20 - glob_t, m)
    np.testing.assert_array_equal(fut_count, np.minimum(max_by_episode, max_by_buffer))


def test_ring_wrap_keeps_logical_order():
    buf = ReplayBuffer.create(n_envs=1, capacity=8, obs_dim=1, act_dim=1)
    buf = _fill(buf, 13, horizon=100)  # wraps: logical window is t=5..12
    batch = buf.sample_segments(jax.random.key(2), (256,), 2, 2)
    ts = np.asarray(batch.obs[:, 0, 0])
    assert ts.min() >= 5 and ts.max() <= 12
    # contiguous future: second step is t+1 wherever valid
    sec_valid = np.asarray(batch.valid[:, 1]) > 0
    np.testing.assert_array_equal(
        np.asarray(batch.obs[sec_valid, 1, 0]), ts[sec_valid] + 1
    )


def test_masked_mean_std():
    x = jnp.array([[1.0], [3.0], [100.0]])
    mask = jnp.array([True, True, False])
    mean, std = masked_mean_std(x, mask)
    np.testing.assert_allclose(float(mean[0]), 2.0, atol=1e-5)
    np.testing.assert_allclose(float(std[0]), 1.0, atol=1e-2)


def test_train_valid_split_disjoint_and_covering():
    """Persistent anchor partition: train draws never hit valid columns."""
    import jax

    from cadm_tpu.train.buffer import ReplayBuffer

    buf = ReplayBuffer.create(2, 64, 3, 2)
    # fill 37 columns with ep_step = column index (one long episode)
    for t in range(37):
        buf = buf.append(
            jnp.ones((2, 3)) * t, jnp.zeros((2, 2)),
            jnp.ones((2, 3)) * (t + 1), jnp.zeros((2,), bool),
            jnp.full((2,), t, jnp.int32),
        )
    assert int(buf.n_valid_anchors()) == 3   # columns 9, 19, 29
    assert int(buf.n_train_anchors()) == 34

    def anchors(split, n=512):
        b = buf.sample_segments(
            jax.random.key(0), (n,), k=2, m=1, split=split
        )
        # anchor obs value encodes the column index
        return np.unique(np.asarray(b.obs[:, 0, 0]).astype(int))

    train_cols = anchors("train")
    valid_cols = anchors("valid")
    assert set(valid_cols) == {9, 19, 29}
    assert set(train_cols).isdisjoint(set(valid_cols))
    # train covers the non-valid columns densely
    assert len(train_cols) > 25
    assert train_cols.max() == 36


def test_bad_transitions_masked_everywhere():
    """Blowup-magnitude transitions (bad=True) are excluded from norm stats,
    future loss masks, and encoder history windows (round-3 fix for the
    stat-poisoning collapse seen on cripple_ant)."""
    horizon, k, m = 100, 3, 3
    buf = ReplayBuffer.create(n_envs=1, capacity=32, obs_dim=1, act_dim=1)
    for t in range(20):
        bad = jnp.array([t == 10])
        obs = jnp.full((1, 1), float(t))
        buf = buf.append(
            obs, obs * 0 + 1.0, obs + (1e4 if t == 10 else 0.5),
            jnp.array([False]), jnp.full((1,), t, jnp.int32), bad=bad,
        )
    # norm stats ignore the huge dobs row
    _, _, dobs, mask = buf.norm_inputs()
    _, ds = masked_mean_std(dobs, mask)
    assert float(ds[0]) < 1.0
    batch = buf.sample_segments(jax.random.key(3), (512,), k, m)
    ts = np.asarray(batch.obs[:, 0, 0]).astype(int)
    # future windows covering t=10 mask that slot
    for j in range(m):
        covers = (ts + j) == 10
        assert not np.any(np.asarray(batch.valid)[covers, j] > 0)
    # history windows covering t=10 mask that slot
    for j in range(1, k + 1):
        covers = (ts - j) == 10
        assert not np.any(np.asarray(batch.hist_valid)[covers, k - j] > 0)
