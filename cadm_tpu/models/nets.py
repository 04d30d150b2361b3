"""Minimal explicit-pytree MLP building blocks.

Raw (W, b) pytrees instead of a module framework: ensemble members are then
just a leading axis added by ``jax.vmap`` over these functions, and the
batched member-stacked forward pass maps 1:1 onto the Pallas ensemble kernel
in ``cadm_tpu.ops`` (same weight layout).

Mirrors the reference's dynamics core (SURVEY.md §2.1 "Dynamics core":
``dynamics/core/layers.py`` MLP constructor, swish activations, truncated
normal init per the CaDM paper appendix).
"""
from __future__ import annotations

from typing import Sequence

import jax
import jax.numpy as jnp

from cadm_tpu.core.types import Array, PyTree


def swish(x: Array) -> Array:
    return x * jax.nn.sigmoid(x)


def mlp_init(rng: Array, sizes: Sequence[int]) -> PyTree:
    """Init an MLP with layer widths ``sizes`` = [in, h1, ..., out].

    Truncated-normal fan-in scaling (the PETS/CaDM convention: std =
    1/(2·sqrt(fan_in))) for hidden layers, zeros for biases.
    """
    params = []
    keys = jax.random.split(rng, len(sizes) - 1)
    for k, (n_in, n_out) in zip(keys, zip(sizes[:-1], sizes[1:])):
        w = jax.random.truncated_normal(k, -2.0, 2.0, (n_in, n_out)) / (
            2.0 * jnp.sqrt(n_in)
        )
        params.append({"w": w, "b": jnp.zeros((n_out,))})
    return params


def gru_init(rng: Array, in_dim: int, hidden: int) -> PyTree:
    """GRU cell parameters (update/reset/candidate gates)."""
    k = jax.random.split(rng, 3)
    scale_x = 1.0 / (2.0 * jnp.sqrt(in_dim))
    scale_h = 1.0 / (2.0 * jnp.sqrt(hidden))

    def mat(key, n_in, scale):
        return jax.random.truncated_normal(key, -2.0, 2.0, (n_in, hidden)) * scale

    return {
        g: {
            "wx": mat(jax.random.fold_in(k[i], 0), in_dim, scale_x),
            "wh": mat(jax.random.fold_in(k[i], 1), hidden, scale_h),
            "b": jnp.zeros((hidden,)),
        }
        for i, g in enumerate(("z", "r", "h"))
    }


def gru_apply(params: PyTree, h: Array, x: Array) -> Array:
    """One GRU step: h' = (1−z)·h + z·tanh(candidate)."""

    def gate(g, a, b):
        return jnp.dot(a, params[g]["wx"]) + jnp.dot(b, params[g]["wh"]) + params[g]["b"]

    z = jax.nn.sigmoid(gate("z", x, h))
    r = jax.nn.sigmoid(gate("r", x, h))
    cand = jnp.tanh(gate("h", x, r * h))
    return (1.0 - z) * h + z * cand


def mlp_apply(params: PyTree, x: Array, activation=swish) -> Array:
    """Apply the MLP; activation on all but the final layer.

    Matmuls are expressed so a leading batch axis maps onto the MXU; under
    vmap over a member axis they become batched matmuls.
    """
    n = len(params)
    for i, layer in enumerate(params):
        x = jnp.dot(x, layer["w"], preferred_element_type=jnp.float32) + layer["b"]
        if i < n - 1:
            x = activation(x)
    return x
