"""On-device replay buffer with trajectory-segment sampling.

Replaces the reference's host-side ``paths`` dict-of-lists dataset
(SURVEY.md §2.1 Sampler / SampleProcessor) with a preallocated device-resident
ring per env: the collect scan appends (obs, act, next_obs, done, ep_step)
time-slices directly — no host round-trip — and the fit loop gathers
(history-K + future-M) windows by index.

Segment validity is derived from the stored within-episode step counter
``ep_step``: a history slot j steps back is real iff the episode is at least
j steps old, and the future window is contiguous iff ``ep_step`` advances by
exactly M-1 across it. Invalid slots are masked in the loss rather than
rejected, keeping sampling rejection-free and fully jittable (SURVEY §7
"hard parts" #3). Ring wrap-around that splices two different episodes is
likewise caught by the ep_step-continuity check.
"""
from __future__ import annotations

import dataclasses
from typing import Tuple

import jax
import jax.numpy as jnp
from flax import struct

from cadm_tpu.core.types import Array
from cadm_tpu.models.dynamics import SegmentBatch


@struct.dataclass
class ReplayBuffer:
    obs: Array       # (E, S, obs_dim)
    act: Array       # (E, S, act_dim)
    next_obs: Array  # (E, S, obs_dim)
    done: Array      # (E, S) bool
    ep_step: Array   # (E, S) int32 — t within episode at this transition
    bad: Array       # (E, S) bool — unhealthy magnitude (Env.bad_transition);
                     # masked out of norm stats, loss weights, and history
    ptr: Array       # () int32 — next physical write column
    size: Array      # () int32 — valid columns (<= S)

    @staticmethod
    def create(n_envs: int, capacity: int, obs_dim: int, act_dim: int) -> "ReplayBuffer":
        return ReplayBuffer(
            obs=jnp.zeros((n_envs, capacity, obs_dim)),
            act=jnp.zeros((n_envs, capacity, act_dim)),
            next_obs=jnp.zeros((n_envs, capacity, obs_dim)),
            done=jnp.zeros((n_envs, capacity), bool),
            ep_step=jnp.zeros((n_envs, capacity), jnp.int32),
            bad=jnp.zeros((n_envs, capacity), bool),
            ptr=jnp.zeros((), jnp.int32),
            size=jnp.zeros((), jnp.int32),
        )

    @property
    def capacity(self) -> int:
        return self.obs.shape[1]

    @property
    def n_envs(self) -> int:
        return self.obs.shape[0]

    # ----------------------------------------------------------- append --
    def append(
        self, obs: Array, act: Array, next_obs: Array, done: Array,
        ep_step: Array, bad: Array | None = None,
    ) -> "ReplayBuffer":
        """Write one time-slice across all envs (called inside the collect scan)."""
        p = self.ptr
        if bad is None:
            bad = jnp.zeros_like(done)
        return dataclasses.replace(
            self,
            obs=self.obs.at[:, p].set(obs),
            act=self.act.at[:, p].set(act),
            next_obs=self.next_obs.at[:, p].set(next_obs),
            done=self.done.at[:, p].set(done),
            ep_step=self.ep_step.at[:, p].set(ep_step),
            bad=self.bad.at[:, p].set(bad),
            ptr=(p + 1) % self.capacity,
            size=jnp.minimum(self.size + 1, self.capacity),
        )

    def append_block(
        self, obs: Array, act: Array, next_obs: Array, done: Array,
        ep_step: Array, bad: Array | None = None,
    ) -> "ReplayBuffer":
        """Write a (T, E, ...) time-major block via scan (post-collect bulk insert)."""
        if bad is None:
            bad = jnp.zeros_like(done)

        def body(buf, slice_):
            o, a, no, d, es, b = slice_
            return buf.append(o, a, no, d, es, b), None

        buf, _ = jax.lax.scan(body, self, (obs, act, next_obs, done, ep_step, bad))
        return buf

    # ----------------------------------------------------------- sample --
    # Every 10th logical column is reserved for validation — a persistent
    # train/valid partition that survives buffer growth (the reference's
    # train_test_split, SURVEY §2.1 "Dynamics core"; ADVICE r1: the valid
    # batch must be excluded from training sampling).
    VALID_STRIDE = 10

    def n_valid_anchors(self) -> Array:
        return self.size // self.VALID_STRIDE

    def n_train_anchors(self) -> Array:
        return self.size - self.n_valid_anchors()

    def sample_segments(
        self,
        rng: Array,
        batch_shape: Tuple[int, ...],
        k: int,
        m: int,
        split: str | None = None,
    ) -> SegmentBatch:
        """Gather ``batch_shape`` random (K-history + M-future) segments.

        ``batch_shape`` may include a leading member axis for bootstrap
        resampling — each index is drawn independently, which IS the
        bootstrap (PETS convention, SURVEY §2.1 ensemble row).

        ``split``: None samples anchors anywhere; "train"/"valid" restrict
        the anchor column to the corresponding persistent partition (columns
        ≡ VALID_STRIDE-1 mod VALID_STRIDE are validation). Note history/
        future windows may still cross partition columns — the holdout is on
        anchors, matching the reference's random split of overlapping
        segments.
        """
        r_env, r_t = jax.random.split(rng)
        env_idx = jax.random.randint(r_env, batch_shape, 0, self.n_envs)
        s = self.VALID_STRIDE
        if split is None:
            # logical anchor t of the first future step, in [0, size)
            t_idx = jax.random.randint(
                r_t, batch_shape, 0, jnp.maximum(self.size, 1)
            )
        elif split == "train":
            u = jax.random.randint(
                r_t, batch_shape, 0, jnp.maximum(self.n_train_anchors(), 1)
            )
            t_idx = (u // (s - 1)) * s + (u % (s - 1))
        elif split == "valid":
            v = jax.random.randint(
                r_t, batch_shape, 0, jnp.maximum(self.n_valid_anchors(), 1)
            )
            t_idx = v * s + (s - 1)
        else:
            raise ValueError(f"unknown split: {split!r}")

        start = (self.ptr - self.size) % self.capacity  # oldest logical column

        def phys(logical):
            return (start + logical) % self.capacity

        def gather(field, logical_idx):
            # field: (E, S, ...); env_idx/logical_idx: batch_shape (+window)
            return field[env_idx[..., None], phys(logical_idx)]

        offs_h = jnp.arange(-k, 0)
        offs_f = jnp.arange(0, m)
        h_idx = t_idx[..., None] + offs_h          # (..., K) logical, may be <0
        f_idx = t_idx[..., None] + offs_f          # (..., M) logical, may be >=size

        h_in_range = (h_idx >= 0) & (h_idx < self.size)
        f_in_range = f_idx < self.size
        h_idx_c = jnp.clip(h_idx, 0, jnp.maximum(self.size - 1, 0))
        f_idx_c = jnp.clip(f_idx, 0, jnp.maximum(self.size - 1, 0))

        hist_obs = gather(self.obs, h_idx_c)
        hist_next = gather(self.next_obs, h_idx_c)
        hist_act = gather(self.act, h_idx_c)
        hist_es = gather(self.ep_step, h_idx_c)
        hist_bad = gather(self.bad, h_idx_c)

        obs = gather(self.obs, f_idx_c)
        act = gather(self.act, f_idx_c)
        next_obs = gather(self.next_obs, f_idx_c)
        f_es = gather(self.ep_step, f_idx_c)
        f_done = gather(self.done, f_idx_c)
        f_bad = gather(self.bad, f_idx_c)

        # --- validity masks -------------------------------------------------
        es0 = f_es[..., 0]  # episode step at the anchor
        # history slot at offset -j is real iff same episode: ep_step == es0 - j
        expect_h = es0[..., None] + offs_h
        hist_valid = (
            h_in_range & (hist_es == expect_h) & (expect_h >= 0) & (~hist_bad)
        ).astype(jnp.float32)
        # future step at offset +j contiguous iff ep_step == es0 + j and no
        # earlier step in the window terminated.
        expect_f = es0[..., None] + offs_f
        contig = f_in_range & (f_es == expect_f)
        prev_done = jnp.cumsum(f_done.astype(jnp.int32), axis=-1) - f_done.astype(
            jnp.int32
        )
        valid = (contig & (prev_done == 0) & (~f_bad)).astype(jnp.float32)

        return SegmentBatch(
            hist_obs=hist_obs,
            hist_dobs=hist_next - hist_obs,
            hist_act=hist_act,
            hist_valid=hist_valid,
            obs=obs,
            act=act,
            next_obs=next_obs,
            valid=valid,
        )

    # ------------------------------------------------------------ stats --
    def norm_inputs(self) -> Tuple[Array, Array, Array, Array]:
        """(obs, act, dobs, mask) flattened over (E, S) for stat computation."""
        mask = (
            (jnp.arange(self.capacity)[None, :] < self.size)
            & jnp.ones((self.n_envs, 1), bool)
            & (~self.bad)
        )
        return (
            self.obs.reshape(-1, self.obs.shape[-1]),
            self.act.reshape(-1, self.act.shape[-1]),
            (self.next_obs - self.obs).reshape(-1, self.obs.shape[-1]),
            mask.reshape(-1),
        )


def masked_mean_std(x: Array, mask: Array, eps: float = 1e-6) -> Tuple[Array, Array]:
    """Mean/std over rows where mask is true (jit-safe)."""
    w = mask.astype(x.dtype)[:, None]
    n = jnp.maximum(jnp.sum(w), 1.0)
    mean = jnp.sum(x * w, axis=0) / n
    var = jnp.sum((x - mean) ** 2 * w, axis=0) / n
    return mean, jnp.sqrt(var + eps) + eps
