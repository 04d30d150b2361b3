"""Reference-parity sampling API (SURVEY.md §2.1 Sampler / SampleProcessor).

``MBTrainer`` fuses collection into its jitted loop and most users should use
it directly — but the reference exposes a standalone
``Sampler.obtain_samples() → paths`` / ``SampleProcessor.process_samples()``
surface (``samplers/sampler.py``, ``samplers/model_sample_processor.py``),
and migrating code may rely on that shape. This module provides the same
contract on top of one jitted scan: the "vectorized env executor" of the
reference (multiprocessing workers + pipes, SURVEY §2.1) is simply
``jax.vmap`` over envs here.
"""
from __future__ import annotations

from typing import Callable, Dict, Optional

import jax
import jax.numpy as jnp
import numpy as np

from cadm_tpu.core.types import Array, History
from cadm_tpu.envs.base import Env

# policy: (obs (E,obs), hist: History batch, rng) -> actions (E,act)
PolicyFn = Callable[[Array, History, Array], Array]


class Sampler:
    def __init__(self, env: Env, n_envs: int, history_k: int = 10, mode: int = 0):
        self.env = env
        self.n_envs = n_envs
        self.history_k = history_k
        self.mode = mode

    def obtain_samples(
        self,
        rng: Array,
        n_steps: int,
        policy: Optional[PolicyFn] = None,
        random: bool = False,
    ) -> Dict[str, np.ndarray]:
        """Roll ``n_steps`` across ``n_envs`` envs; returns time-major paths.

        ``random=True`` reproduces the reference's first-iteration uniform
        bootstrap actions (SURVEY §2.1 Sampler row).
        """
        env, n = self.env, self.n_envs
        r_reset, r_run = jax.random.split(rng)
        states = jax.vmap(lambda k: env.reset(k, self.mode))(
            jax.random.split(r_reset, n)
        )
        hists = jax.vmap(
            lambda _: History.zeros(self.history_k, env.obs_dim, env.act_dim)
        )(jnp.arange(n))

        def step(carry, k):
            states, hists = carry
            if random or policy is None:
                actions = jax.random.uniform(
                    k, (n, env.act_dim), minval=-1.0, maxval=1.0
                )
            else:
                actions = policy(states.obs, hists, k)
            prev_obs = states.obs
            next_states, obs, reward, done = jax.vmap(
                lambda s, a: env.step(s, a, self.mode)
            )(states, actions)
            pushed = jax.vmap(History.push)(hists, prev_obs, obs - prev_obs, actions)
            hists = jax.tree.map(
                lambda x: jnp.where(
                    done.reshape((-1,) + (1,) * (x.ndim - 1)),
                    jnp.zeros_like(x),
                    x,
                ),
                pushed,
            )
            out = dict(
                observations=prev_obs,
                actions=actions,
                next_observations=obs,
                rewards=reward,
                dones=done,
            )
            return (next_states, hists), out

        @jax.jit
        def run(states, hists, rng):
            keys = jax.random.split(rng, n_steps)
            (_, _), paths = jax.lax.scan(step, (states, hists), keys)
            return paths

        paths = run(states, hists, r_run)
        return {k: np.asarray(v) for k, v in paths.items()}


class ModelSampleProcessor:
    """Flattens paths → training arrays + return statistics (SURVEY §2.1)."""

    def process_samples(self, paths: Dict[str, np.ndarray]) -> Dict[str, np.ndarray]:
        flat = {
            k: v.reshape((-1,) + v.shape[2:])
            for k, v in paths.items()
        }
        rewards, dones = paths["rewards"], paths["dones"]
        # episode returns: accumulate until each done
        returns = []
        acc = np.zeros(rewards.shape[1])
        for t in range(rewards.shape[0]):
            acc += rewards[t]
            for e in np.nonzero(dones[t])[0]:
                returns.append(acc[e])
                acc[e] = 0.0
        flat["episode_returns"] = np.asarray(returns)
        flat["average_return"] = (
            float(np.mean(returns)) if returns else float("nan")
        )
        return flat
