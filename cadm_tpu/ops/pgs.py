"""Pallas TPU kernel: batched projected Gauss–Seidel contact solve.

Why a kernel (SURVEY.md §7 "Pallas kernels: batched contact solve"): the
XLA lowering of a Gauss–Seidel sweep is ~45 sequential row-update ops per
sweep, each a full HBM round-trip over the (batch, 3nc) impulse state —
~2 GB of traffic per physics substep at 8k envs, which dominated the entire
engine. Here the Delassus blocks are DMA'd to VMEM once and ALL sweeps run
out of VMEM, so traffic drops to one read of A plus one write of λ.

Layout: ENV AXIS ON LANES. Per grid program (BLOCK_E envs):
  A      (3nc, 3nc, BLOCK_E)  Delassus operator, env minor-most
  b      (3nc, BLOCK_E)       Jv_pred (contact-frame velocity before impulse)
  vstar  (nc, BLOCK_E)        Baumgarte normal target velocity
  actmu  (nc, BLOCK_E)        active·μ (0 for non-penetrating contacts)
  lam    (3nc, BLOCK_E) out   contact impulses (mutated in place by sweeps)
Every access is a STATIC leading index → contiguous (rows, lanes) tiles, no
relayouts; row stores hit full 128-lane vectors. Contact count nc is static.
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from cadm_tpu.core.types import Array

# Per-call block size: the Delassus block (3nc)²·BLOCK·4B must fit VMEM with
# headroom for the other refs and pipelining; pick the largest power of two
# within an ~6MB budget, capped at 512 (cheetah: 512; humanoid nc=29: 128).
MAX_BLOCK_E = 512
VMEM_BUDGET_BYTES = 6 * 1024 * 1024


def _block_for(nc: int) -> int:
    block = MAX_BLOCK_E
    while block > 128 and (3 * nc) ** 2 * block * 4 > VMEM_BUDGET_BYTES:
        block //= 2
    return block


def _pgs_kernel(
    nc: int, iters: int, A_ref, b_ref, vstar_ref, actmu_ref, lam0_ref, lam_ref
):
    A = A_ref[:]          # (3nc, 3nc, E)
    b = b_ref[:]          # (3nc, E)
    vstar = vstar_ref[:]  # (nc, E)
    actmu = actmu_ref[:]  # (nc, E)

    lam_ref[:] = lam0_ref[:]  # warm start (zeros on a cold solve)

    def body(_, carry):
        for i in range(nc):
            iz, ix, iy = 3 * i + 2, 3 * i, 3 * i + 1
            lam = lam_ref[:]
            r = jnp.sum(A[iz] * lam, axis=0) + b[iz] - vstar[i]
            active = (actmu[i] > 0.0).astype(b.dtype)
            ln = jnp.maximum(lam[iz] - r / A[iz, iz], 0.0) * active
            lam_ref[iz, :] = ln
            lam = lam_ref[:]
            rx = jnp.sum(A[ix] * lam, axis=0) + b[ix]
            lx = lam[ix] - rx / A[ix, ix]
            ry = jnp.sum(A[iy] * lam, axis=0) + b[iy]
            ly = lam[iy] - ry / A[iy, iy]
            t_norm = jnp.sqrt(lx * lx + ly * ly) + 1e-9
            scale = jnp.minimum(1.0, actmu[i] * ln / t_norm)
            lam_ref[ix, :] = lx * scale
            lam_ref[iy, :] = ly * scale
        return carry

    jax.lax.fori_loop(0, iters, body, 0)


@functools.partial(
    jax.jit, static_argnames=("nc", "iters", "interpret", "block")
)
def pgs_solve(
    A: Array,
    b: Array,
    vstar: Array,
    actmu: Array,
    lam0: Array = None,
    *,
    nc: int,
    iters: int,
    interpret: bool = False,
    block: int = 0,
) -> Array:
    """Batched PGS: A (E,3nc,3nc), b (E,3nc), vstar/actmu (E,nc) → λ (E,3nc).

    ``nc``/``iters`` are required keyword-only: a defaulted iters=0 would
    silently run zero sweeps and return ``lam0`` unchanged. ``lam0`` (E,3nc)
    warm-starts the sweeps (None = cold/zeros). ``block``: env-block override
    (0 = auto via the VMEM budget). Interpret-mode tests pass a tiny block so
    the padded batch stays small.
    """
    assert nc > 0 and iters > 0, "pgs_solve needs nc > 0 and iters > 0"
    e = A.shape[0]
    if lam0 is None:
        lam0 = jnp.zeros_like(b)
    block = block or _block_for(nc)
    pad = (-e) % block
    if pad:
        A = jnp.concatenate(
            [A, jnp.tile(jnp.eye(3 * nc)[None], (pad, 1, 1))], axis=0
        )
        b = jnp.pad(b, ((0, pad), (0, 0)))
        vstar = jnp.pad(vstar, ((0, pad), (0, 0)))
        actmu = jnp.pad(actmu, ((0, pad), (0, 0)))
        lam0 = jnp.pad(lam0, ((0, pad), (0, 0)))
    ep = A.shape[0]

    # env axis → lanes (minor-most)
    A_t = jnp.transpose(A, (1, 2, 0))
    b_t = jnp.transpose(b, (1, 0))
    vstar_t = jnp.transpose(vstar, (1, 0))
    actmu_t = jnp.transpose(actmu, (1, 0))
    lam0_t = jnp.transpose(lam0, (1, 0))

    grid = (ep // block,)
    kernel = functools.partial(_pgs_kernel, nc, iters)
    row_spec = pl.BlockSpec(
        (3 * nc, block), lambda i: (0, i), memory_space=pltpu.VMEM
    )
    lam_t = pl.pallas_call(
        kernel,
        out_shape=jax.ShapeDtypeStruct((3 * nc, ep), A.dtype),
        grid=grid,
        in_specs=[
            pl.BlockSpec(
                (3 * nc, 3 * nc, block),
                lambda i: (0, 0, i),
                memory_space=pltpu.VMEM,
            ),
            row_spec,
            pl.BlockSpec(
                (nc, block), lambda i: (0, i), memory_space=pltpu.VMEM
            ),
            pl.BlockSpec(
                (nc, block), lambda i: (0, i), memory_space=pltpu.VMEM
            ),
            row_spec,
        ],
        out_specs=row_spec,
        interpret=interpret,
    )(A_t, b_t, vstar_t, actmu_t, lam0_t)
    return jnp.transpose(lam_t, (1, 0))[:e]
