"""NaN/fault guards (SURVEY.md §5 "race detection / sanitizers" row).

The reference relies on crashes; races are impossible here by construction
(pure jit programs). What CAN go wrong on TPU is silent NaN/Inf propagation
through the physics or the learned model. ``checked`` wraps any jittable
function with jax.experimental.checkify float checks; ``assert_finite``
raises at trace-boundary with the offending leaf names for fast triage.
"""
from __future__ import annotations

from typing import Any, Callable

import jax
import jax.numpy as jnp
from jax.experimental import checkify


def checked(fn: Callable, *, errors=None) -> Callable:
    """Wrap ``fn`` so float errors (nan/inf/div) surface as python errors.

    Usage::

        step = checked(jax.jit(step))
        out = step(...)   # raises checkify.JaxRuntimeError on NaN
    """
    errors = errors or checkify.float_checks
    cfn = checkify.checkify(fn, errors=errors)

    def wrapper(*args, **kwargs):
        err, out = cfn(*args, **kwargs)
        err.throw()
        return out

    return wrapper


def assert_finite(tree: Any, where: str = "") -> None:
    """Host-side finite check over a pytree, naming the offending leaf."""
    flat, treedef = jax.tree.flatten_with_path(tree) if hasattr(
        jax.tree, "flatten_with_path"
    ) else (None, None)
    if flat is None:  # older jax fallback
        for i, leaf in enumerate(jax.tree.leaves(tree)):
            if not bool(jnp.isfinite(leaf).all()):
                raise FloatingPointError(f"non-finite leaf #{i} {where}")
        return
    for path, leaf in flat:
        if hasattr(leaf, "dtype") and jnp.issubdtype(leaf.dtype, jnp.floating):
            if not bool(jnp.isfinite(leaf).all()):
                raise FloatingPointError(
                    f"non-finite values at {jax.tree_util.keystr(path)} {where}"
                )
