"""Fused FK kernel and analytic bias: exact agreement with the reference
implementations (jvp-based bias; pure-JAX tree walk)."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from cadm_tpu.envs.rigid_base import load_system
from cadm_tpu.ops.fk_kernel import fk_vel_pallas
from cadm_tpu.physics.rigid import dynamics as dyn
from cadm_tpu.physics.rigid.kinematics import forward_velocities


def _state(sys_, seed=0, n=None):
    rng = np.random.RandomState(seed)
    shape = (sys_.nq,) if n is None else (n, sys_.nq)
    qpos = sys_.default_qpos() + rng.uniform(-0.1, 0.1, shape)
    for j in range(sys_.nj):
        if sys_.jnt_type[j] == 0:
            a = int(sys_.jnt_qposadr[j]) + 3
            qn = np.linalg.norm(qpos[..., a: a + 4], axis=-1, keepdims=True)
            qpos[..., a: a + 4] /= qn
    qvel = rng.uniform(-1, 1, shape[:-1] + (sys_.nv,))
    return jnp.asarray(qpos), jnp.asarray(qvel)


@pytest.mark.parametrize("asset", ["half_cheetah.xml", "ant.xml", "hopper.xml"])
def test_analytic_bias_matches_jvp(asset):
    sys_ = load_system(asset)
    qpos, qvel = _state(sys_)
    fkv = forward_velocities(sys_, qpos, qvel)
    c_new = dyn.bias_from_fkvel(sys_, fkv, jnp.ones(()))
    c_old = dyn.bias_forces(sys_, qpos, qvel, jnp.ones(()))
    scale = max(1.0, float(jnp.abs(c_old).max()))
    assert float(jnp.abs(c_new - c_old).max()) / scale < 1e-5


@pytest.mark.parametrize("asset", ["half_cheetah.xml", "ant.xml", "hopper.xml"])
def test_fk_kernel_matches_pure(asset):
    sys_ = load_system(asset)
    qpos, qvel = _state(sys_, n=4)
    d = fk_vel_pallas(sys_, qpos, qvel, interpret=True)
    ref = jax.vmap(lambda qp, qv: forward_velocities(sys_, qp, qv))(qpos, qvel)
    pairs = {
        "pos": ref.body_pos, "com": ref.com, "omega": ref.omega,
        "v_com": ref.v_com, "alpha0": ref.alpha0, "a_com0": ref.a_com0,
        "dof_axis": ref.dof_axis, "dof_anchor": ref.dof_anchor,
        "quat": None,
    }
    for name, r in pairs.items():
        if r is None:
            continue
        np.testing.assert_allclose(
            np.asarray(d[name]), np.asarray(r), atol=2e-6, err_msg=name
        )
    # quats: rotation matrices derived from them must match body_rot
    from cadm_tpu.physics.rigid import math3d

    rot_k = np.asarray(math3d.quat_to_mat(d["quat"]))
    np.testing.assert_allclose(rot_k, np.asarray(ref.body_rot), atol=2e-6)
