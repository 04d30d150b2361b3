"""Dynamics-randomization specs: discrete paper sets + continuous bands.

The CaDM evaluation protocol (arXiv:2005.06800 §5.1 and appendix; same
protocol reused by the authors' follow-up TMCL, NeurIPS 2020) draws hidden
physics parameters per episode from DISCRETE scale sets:

- training: an interpolation set around the nominal value,
  canonically ``{0.75, 0.85, 1.00, 1.15, 1.25}`` × nominal;
- test *moderate*: scales just outside the training hull,
  canonically ``{0.40, 0.50, 1.50, 1.60}`` × nominal;
- test *extreme*: further out, canonically ``{0.20, 0.30, 1.70, 1.80}``.

``ScaleSet`` encodes that protocol (the round-2 default everywhere).
``ScaleRange`` keeps round 1's continuous-band variant as an option
(``randomization="continuous"``) — useful as a harder, denser task family
and for ablations.

Provenance note: the reference mount was empty in both rounds (SURVEY.md
header), so the numeric sets are transcribed from the paper lineage, not from
reference code; the canonical multiplicative scheme above is applied uniformly
to every randomized parameter (mass/damping scales for the rigid families,
mass/length for Pendulum, push-force/pole-length for CartPole). Re-verify the
per-env sets against the reference the moment it becomes readable.
"""
from __future__ import annotations

import dataclasses
from typing import Tuple

import jax
import jax.numpy as jnp

from cadm_tpu.core.types import Array


@dataclasses.dataclass(frozen=True)
class ScaleSet:
    """Per-mode discrete value sets (the paper's randomization protocol).

    ``sample`` draws uniformly from the mode's set. ``mode`` is a static
    Python int (0=train / 1=moderate / 2=extreme) — each jitted program is
    specialized to one evaluation mode, matching the trainer's per-mode eval
    scans.
    """

    train: Tuple[float, ...]
    moderate: Tuple[float, ...]
    extreme: Tuple[float, ...]

    def sample(self, rng: Array, mode: int) -> Array:
        vals = jnp.asarray((self.train, self.moderate, self.extreme)[mode])
        idx = jax.random.randint(rng, (), 0, vals.shape[0])
        return vals[idx]

    def scaled(self, base: float) -> "ScaleSet":
        """The same set multiplied onto a nominal value (e.g. force 10.0)."""
        return ScaleSet(
            train=tuple(base * v for v in self.train),
            moderate=tuple(base * v for v in self.moderate),
            extreme=tuple(base * v for v in self.extreme),
        )


@dataclasses.dataclass(frozen=True)
class ScaleRange:
    """Train interval plus two-sided extrapolation bands (continuous option).

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

    def scaled(self, base: float) -> "ScaleRange":
        return ScaleRange(
            train=tuple(base * v for v in self.train),
            moderate=tuple(base * v for v in self.moderate),
            extreme=tuple(base * v for v in self.extreme),
        )


# The paper's canonical multiplicative scheme. Both representations share the
# same train hull [0.75, 1.25] so results are comparable across schemes.
CANONICAL_SET = ScaleSet(
    train=(0.75, 0.85, 1.00, 1.15, 1.25),
    moderate=(0.40, 0.50, 1.50, 1.60),
    extreme=(0.20, 0.30, 1.70, 1.80),
)
CANONICAL_RANGE = ScaleRange(
    train=(0.75, 1.25),
    moderate=(0.40, 0.75, 1.25, 1.60),
    extreme=(0.20, 0.40, 1.60, 1.80),
)

# Back-compat aliases (round-1 names).
MASS_DAMPING_SCALE = CANONICAL_RANGE


def canonical(randomization: str) -> "ScaleSet | ScaleRange":
    """Pick the canonical sampler for a randomization scheme name."""
    if randomization == "discrete":
        return CANONICAL_SET
    if randomization == "continuous":
        return CANONICAL_RANGE
    raise ValueError(f"unknown randomization scheme: {randomization!r}")
