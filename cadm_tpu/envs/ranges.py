"""Dynamics-randomization range specs.

The CaDM evaluation protocol (arXiv:2005.06800 §5.1) samples hidden physics
parameters per episode from a *training* interval, and evaluates generalization
on *moderate* and *extreme* ranges that extrapolate OUTSIDE the training
interval on both sides. ``ScaleRange`` encodes that three-tier structure as a
pure sampler.

Exact numeric ranges are paper-grade (the reference mount was empty at build
time — SURVEY.md header); they follow the paper's scheme of train ⊂ moderate ⊂
extreme with test mass/damping/length scales drawn from the bands excluded
from training. Recalibrate against the reference when readable.
"""
from __future__ import annotations

import dataclasses
from typing import Tuple

import jax
import jax.numpy as jnp

from cadm_tpu.core.types import Array


@dataclasses.dataclass(frozen=True)
class ScaleRange:
    """Train interval plus two-sided extrapolation bands.

    train:    (lo, hi) — per-episode uniform draw during training.
    moderate: (outer_lo, inner_lo, inner_hi, outer_hi) — draw uniformly from
              [outer_lo, inner_lo] ∪ [inner_hi, outer_hi].
    extreme:  same structure, further out.
    """

    train: Tuple[float, float]
    moderate: Tuple[float, float, float, float]
    extreme: Tuple[float, float, float, float]

    def sample(self, rng: Array, mode: int) -> Array:
        if mode == 0:
            lo, hi = self.train
            return jax.random.uniform(rng, (), minval=lo, maxval=hi)
        band = self.moderate if mode == 1 else self.extreme
        r_side, r_val = jax.random.split(rng)
        left = jax.random.bernoulli(r_side)
        lo = jnp.where(left, band[0], band[2])
        hi = jnp.where(left, band[1], band[3])
        return jax.random.uniform(r_val, (), minval=0.0, maxval=1.0) * (hi - lo) + lo


# The paper's canonical multiplicative scheme for mass/damping scales
# (train [0.75, 1.25]; moderate/extreme extrapolation bands).
MASS_DAMPING_SCALE = ScaleRange(
    train=(0.75, 1.25),
    moderate=(0.50, 0.75, 1.25, 1.50),
    extreme=(0.25, 0.50, 1.50, 1.75),
)
