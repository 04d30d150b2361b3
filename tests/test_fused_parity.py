"""Interpret-mode parity for the PRODUCTION TPU kernels (ADVICE r1 #1).

The fused full-dynamics kernel (ops/fk_kernel.full_dyn_pallas) and the
VMEM-resident PGS solver (ops/pgs.pgs_solve) are what every rigid env runs
on the TPU; the CPU suite normally takes the platform_dependent fallback, so
these tests execute the ACTUAL kernels via Pallas interpret mode and compare
against the composed pure-JAX path / a reference Gauss-Seidel sweep.
"""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from cadm_tpu.envs.rigid_base import load_system
from cadm_tpu.ops.fk_kernel import FULL_DYN_MAX_NV, full_dyn_pallas
from cadm_tpu.ops.pgs import pgs_solve
from cadm_tpu.physics.rigid import dynamics as dyn
from cadm_tpu.physics.rigid.kinematics import forward_velocities
from cadm_tpu.ops.linalg import spd_inverse

# The interpret-mode XLA compile of the unrolled kernel grows sharply with
# nv (hopper ~40s, cheetah ~4 min, ant/humanoid 10+ min on CPU): hopper
# runs in the default suite; the rest run under `-m slow`, and ALL FOUR run
# as the real compiled kernels on TPU via scripts/tpu_parity.py (the
# hardware-grade check — interpret mode here is the CI smoke).
ASSETS = ["hopper.xml"]
SLOW_ASSETS = ["half_cheetah.xml", "ant.xml", "slim_humanoid.xml"]


def _state(sys_, seed=0, n=4):
    rng = np.random.RandomState(seed)
    shape = (n, sys_.nq)
    qpos = sys_.default_qpos() + rng.uniform(-0.1, 0.1, shape)
    for j in range(sys_.nj):
        if sys_.jnt_type[j] == 0:
            a = int(sys_.jnt_qposadr[j]) + 3
            qn = np.linalg.norm(qpos[..., a: a + 4], axis=-1, keepdims=True)
            qpos[..., a: a + 4] /= qn
    qvel = rng.uniform(-1, 1, (n, sys_.nv))
    ctrl = rng.uniform(-1, 1, (n, sys_.nu))
    ms = rng.uniform(0.8, 1.2, (n,))
    ds = rng.uniform(0.8, 1.2, (n,))
    am = np.ones((n, sys_.nu))
    am[0, 0] = 0.0  # one masked actuator, exercising the act-mask path
    return map(jnp.asarray, (qpos, qvel, ctrl, ms, ds, am))


def _pure_smooth(sys_, qpos, qvel, ctrl, ms, ds, am):
    """The composed pure path, mirroring dynamics._smooth_dispatch."""
    fkv = forward_velocities(sys_, qpos, qvel)
    M = dyn.mass_matrix(sys_, fkv, ms)
    c = dyn.bias_from_fkvel(sys_, fkv, ms)
    B = jnp.asarray(sys_.dof_damping) * ds
    tau = (
        dyn.actuation(sys_, ctrl, am)
        + dyn.passive_forces(sys_, qpos, qvel, ds)
        - c
        - B * qvel
    )
    Minv = spd_inverse(M + sys_.dt * jnp.diag(B))
    v_pred = qvel + sys_.dt * (Minv @ tau)
    return Minv, v_pred


@pytest.mark.parametrize("asset", ASSETS)
def test_full_dyn_kernel_matches_composed_path(asset):
    sys_ = load_system(asset)
    if sys_.nv > FULL_DYN_MAX_NV:
        pytest.skip(f"nv={sys_.nv} beyond kernel limit")
    qpos, qvel, ctrl, ms, ds, am = _state(sys_)
    # block=8 (the minimum: the env axis is laid out as (8, block/8) tiles):
    # the production BLOCK_E=2048 would pad the 4-env batch 512x and the
    # interpreter executes every op at padded width (an hour for ant);
    # block only changes padding/grid, not kernel semantics
    d = full_dyn_pallas(
        sys_, qpos, qvel, ctrl, ms, ds, am, interpret=True, block=8
    )
    Minv_ref, v_ref = jax.vmap(
        lambda *a: _pure_smooth(sys_, *a)
    )(qpos, qvel, ctrl, ms, ds, am)
    np.testing.assert_allclose(
        np.asarray(d["minv"]), np.asarray(Minv_ref), atol=5e-5,
        err_msg=f"{asset} Minv",
    )
    np.testing.assert_allclose(
        np.asarray(d["v_pred"][..., 0]), np.asarray(v_ref),
        atol=5e-4, err_msg=f"{asset} v_pred",
    )


def _reference_pgs(A, b, v_star, active_mu, nc, iters):
    """Per-env projected Gauss-Seidel with friction-cone clamp (the
    documented algorithm of dynamics._pgs_dispatch.solve_xla)."""
    lam = np.zeros(3 * nc)
    for _ in range(iters):
        for i in range(nc):
            iz, ix, iy = 3 * i + 2, 3 * i, 3 * i + 1
            active = 1.0 if active_mu[i] > 0 else 0.0
            r = A[iz] @ lam + b[iz] - v_star[i]
            ln = max(lam[iz] - r / A[iz, iz], 0.0) * active
            lam[iz] = ln
            rx = A[ix] @ lam + b[ix]
            lx = lam[ix] - rx / A[ix, ix]
            ry = A[iy] @ lam + b[iy]
            ly = lam[iy] - ry / A[iy, iy]
            t_norm = np.sqrt(lx * lx + ly * ly) + 1e-9
            scale = min(1.0, active_mu[i] * ln / t_norm)
            lam[ix], lam[iy] = lx * scale, ly * scale
    return lam


@pytest.mark.parametrize("nc", [4, 6, 29])  # cheetah/hopper, ant, humanoid
def test_pgs_kernel_matches_reference_sweep(nc):
    rng = np.random.RandomState(1)
    E, iters = 8, 12
    G = rng.randn(E, 3 * nc, 3 * nc)
    A = G @ np.transpose(G, (0, 2, 1)) / (3 * nc) + 0.5 * np.eye(3 * nc)
    b = rng.randn(E, 3 * nc)
    v_star = np.abs(rng.randn(E, nc))
    active_mu = rng.choice([0.0, 0.5, 1.0], size=(E, nc))
    lam_k = pgs_solve(
        jnp.asarray(A), jnp.asarray(b), jnp.asarray(v_star),
        jnp.asarray(active_mu), nc=nc, iters=iters, interpret=True,
        block=8,
    )
    lam_ref = np.stack(
        [_reference_pgs(A[e], b[e], v_star[e], active_mu[e], nc, iters)
         for e in range(E)]
    )
    np.testing.assert_allclose(np.asarray(lam_k), lam_ref, atol=1e-4)
    # inactive contacts carry zero impulse
    inactive = np.repeat(active_mu == 0.0, 3, axis=1)
    assert np.abs(np.asarray(lam_k)[inactive]).max() < 1e-6


@pytest.mark.slow
@pytest.mark.parametrize("asset", SLOW_ASSETS)
def test_full_dyn_kernel_matches_composed_path_slow(asset):
    test_full_dyn_kernel_matches_composed_path(asset)
