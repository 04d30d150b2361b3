"""Pin the paper's discrete randomization protocol (VERDICT r1 item 1).

The CaDM protocol draws hidden params from DISCRETE per-mode scale sets
(arXiv:2005.06800 §5.1): train {0.75, 0.85, 1.00, 1.15, 1.25} × nominal,
moderate {0.40, 0.50, 1.50, 1.60}, extreme {0.20, 0.30, 1.70, 1.80}. These
tests pin the sets and verify every env family draws only set members.
"""
import jax
import numpy as np
import pytest

from cadm_tpu.envs import make
from cadm_tpu.envs.ranges import CANONICAL_SET, ScaleSet, canonical

TRAIN_SET = (0.75, 0.85, 1.00, 1.15, 1.25)
MODERATE_SET = (0.40, 0.50, 1.50, 1.60)
EXTREME_SET = (0.20, 0.30, 1.70, 1.80)


def test_canonical_set_values_pinned():
    assert CANONICAL_SET.train == TRAIN_SET
    assert CANONICAL_SET.moderate == MODERATE_SET
    assert CANONICAL_SET.extreme == EXTREME_SET


def _assert_draws_in(samples, allowed):
    samples = np.asarray(samples).ravel()
    allowed = np.asarray(allowed)
    dist = np.abs(samples[:, None] - allowed[None, :]).min(axis=1)
    assert (dist < 1e-6).all(), f"off-set draws: {samples[dist >= 1e-6][:5]}"


def test_scale_set_sampling_covers_and_stays_on_set():
    keys = jax.random.split(jax.random.key(0), 256)
    for mode, allowed in enumerate((TRAIN_SET, MODERATE_SET, EXTREME_SET)):
        draws = jax.vmap(lambda k: CANONICAL_SET.sample(k, mode))(keys)
        _assert_draws_in(draws, allowed)
        # every member gets drawn (uniform over the set)
        for v in allowed:
            assert (np.abs(np.asarray(draws) - v) < 1e-6).any()


@pytest.mark.parametrize(
    "name", ["cartpole", "pendulum", "half_cheetah", "hopper", "ant", "slim_humanoid"]
)
def test_env_families_draw_from_discrete_sets(name):
    env = make(name)
    nominal = {
        "cartpole": {"force_mag": 10.0, "length": 0.5},
    }.get(name, None)
    keys = jax.random.split(jax.random.key(1), 128)
    for mode, allowed in enumerate((TRAIN_SET, MODERATE_SET, EXTREME_SET)):
        params = jax.vmap(lambda k: env.sample_params(k, mode))(keys)
        for field, leaf in vars(params).items():
            base = nominal[field] if nominal else 1.0
            _assert_draws_in(leaf, [base * v for v in allowed])


def test_continuous_option_still_available():
    env = make("half_cheetah", randomization="continuous")
    keys = jax.random.split(jax.random.key(2), 128)
    params = jax.vmap(lambda k: env.sample_params(k, 0))(keys)
    draws = np.asarray(params.mass_scale)
    assert (draws >= 0.75).all() and (draws <= 1.25).all()
    # continuous: essentially no repeated values
    assert len(np.unique(np.round(draws, 6))) > 100
    assert isinstance(canonical("discrete"), ScaleSet)
