"""Small-matrix batched linear algebra, statically unrolled for TPU.

XLA's generic batched Cholesky/triangular-solve lowers to sequential loops
with dynamic slicing — catastrophic for the (batch, nv, nv) joint-space
systems of this engine (nv = 9..23, batch = thousands). Here the dimension n
is STATIC, so we unroll Cholesky–Crout and the triangular solves into O(n²)
fused vector ops over the batch; the explicit SPD inverse then turns every
downstream solve into a plain batched matmul on the MXU (qacc solve, contact
Delassus operator, impulse back-substitution — see physics/rigid/dynamics.py).

Accuracy: f32, fine for the well-conditioned mass matrices here (armature
terms keep diagonals healthy); golden tests pin the error budget.
"""
from __future__ import annotations

import jax.numpy as jnp

from cadm_tpu.core.types import Array


def cholesky_unrolled(M: Array) -> Array:
    """Lower-triangular Cholesky factor of (..., n, n) SPD M; n static."""
    n = M.shape[-1]
    cols = []  # L columns, each (..., n)
    for j in range(n):
        s = M[..., :, j]
        for k in range(j):
            s = s - cols[k] * cols[k][..., j: j + 1]
        d = jnp.sqrt(jnp.maximum(s[..., j], 1e-12))
        col = s / d[..., None]
        # zero the strictly-upper part of this column
        mask = jnp.arange(n) >= j
        cols.append(col * mask)
    return jnp.stack(cols, axis=-1)


def spd_inverse(M: Array) -> Array:
    """Explicit inverse of a small SPD matrix via unrolled Cholesky.

    M: (..., n, n) with static n. Returns (..., n, n).
    """
    n = M.shape[-1]
    L = cholesky_unrolled(M)
    # forward substitution: L Y = I, row by row (rows are (..., n) over RHS)
    y_rows = []
    inv_diag = 1.0 / L[..., jnp.arange(n), jnp.arange(n)]
    eye = jnp.eye(n, dtype=M.dtype)
    for i in range(n):
        r = jnp.broadcast_to(eye[i], M.shape[:-2] + (n,))
        for k in range(i):
            r = r - L[..., i, k: k + 1] * y_rows[k]
        y_rows.append(r * inv_diag[..., i: i + 1])
    # back substitution: Lᵀ X = Y
    x_rows: list = [None] * n
    for i in reversed(range(n)):
        r = y_rows[i]
        for k in range(i + 1, n):
            r = r - L[..., k, i: i + 1] * x_rows[k]
        x_rows[i] = r * inv_diag[..., i: i + 1]
    X = jnp.stack(x_rows, axis=-2)
    # symmetrize (inverse of SPD is SPD; cheap insurance against drift)
    return 0.5 * (X + jnp.swapaxes(X, -1, -2))
