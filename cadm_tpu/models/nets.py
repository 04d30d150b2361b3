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
