"""Golden-trajectory parity vs MuJoCo (SURVEY.md §4.1).

Compares the pure-JAX engine against the installed ``mujoco`` on the SAME
MJCF assets: forward kinematics, joint-space mass matrix, bias forces,
passive spring forces, and in-air (contact-free) trajectory rollouts where
the analytic model is exact. Contact-phase behavior is validated separately
by construction tests (stiction/sliding) since penalty-vs-LCP solver details
legitimately differ.
"""
import os

import jax
import jax.numpy as jnp
import numpy as np
import pytest

mujoco = pytest.importorskip("mujoco")

from cadm_tpu.physics.rigid import dynamics as dyn
from cadm_tpu.physics.rigid.kinematics import forward_kinematics
from cadm_tpu.physics.rigid.mjcf import system_from_mjcf

ASSETS = os.path.join(
    os.path.dirname(__file__), "..", "cadm_tpu", "envs", "assets"
)
ANT_INIT = np.array([0, 0, 0.55, 1, 0, 0, 0, 0, 1.0, 0, -1.0, 0, -1.0, 0, 1.0])


def _load(name):
    xml = open(os.path.join(ASSETS, f"{name}.xml")).read()
    return mujoco.MjModel.from_xml_string(xml), system_from_mjcf(xml)


def _valid_state(m, name, seed=0):
    rng = np.random.RandomState(seed)
    base = ANT_INIT if name == "ant" else m.qpos0.copy()
    qpos = base + rng.uniform(-0.03, 0.03, m.nq)
    for j in range(m.njnt):
        if m.jnt_type[j] == 0:
            a = m.jnt_qposadr[j] + 3
            qpos[a: a + 4] /= np.linalg.norm(qpos[a: a + 4])
        if m.jnt_limited[j]:
            a = m.jnt_qposadr[j]
            qpos[a] = np.clip(
                qpos[a], m.jnt_range[j, 0] + 0.02, m.jnt_range[j, 1] - 0.02
            )
    qvel = rng.uniform(-0.4, 0.4, m.nv)
    return qpos, qvel


@pytest.mark.parametrize(
    "name", ["half_cheetah", "ant", "hopper", "slim_humanoid"]
)
def test_analytic_terms_match_mujoco(name):
    m, sys_ = _load(name)
    d = mujoco.MjData(m)
    qpos, qvel = _valid_state(m, name)
    d.qpos[:] = qpos
    d.qvel[:] = qvel
    mujoco.mj_forward(m, d)

    @jax.jit
    def mine(qp, qv):
        fk = forward_kinematics(sys_, qp)
        M = dyn.mass_matrix(sys_, fk, jnp.ones(()))
        c = dyn.bias_forces(sys_, qp, qv, jnp.ones(()))
        p = dyn.passive_forces(sys_, qp, qv, jnp.ones(()))
        return fk.body_pos, M, c, p

    bp, M_mine, c_mine, p_mine = map(
        np.asarray, mine(jnp.asarray(qpos), jnp.asarray(qvel))
    )
    np.testing.assert_allclose(bp, d.xpos, atol=5e-3)

    Mfull = np.zeros((m.nv, m.nv))
    mujoco.mj_fullM(m, d, Mfull)
    assert np.abs(Mfull - M_mine).max() / max(1.0, np.abs(Mfull).max()) < 5e-3

    assert (
        np.abs(d.qfrc_bias - c_mine).max()
        / max(1.0, np.abs(d.qfrc_bias).max())
        < 5e-3
    )
    # mujoco's qfrc_passive = spring − damping·qvel (we integrate damping
    # implicitly, so add it back for comparison)
    np.testing.assert_allclose(
        p_mine - m.dof_damping * qvel, d.qfrc_passive, atol=1e-3
    )


@pytest.mark.parametrize("name", ["half_cheetah", "hopper"])
def test_inair_trajectory_matches_mujoco(name):
    """Contact-free flight: our Euler step should track MuJoCo's closely."""
    m, sys_ = _load(name)
    d = mujoco.MjData(m)
    qpos, qvel = _valid_state(m, name, seed=1)
    qpos[1] += 2.0  # planar envs: lift rootz well above the floor
    rng = np.random.RandomState(2)
    ctrl = rng.uniform(-0.5, 0.5, (40, m.nu))
    d.qpos[:] = qpos
    d.qvel[:] = qvel

    params = dyn.RigidParams.default(sys_)
    step1 = jax.jit(lambda qp, qv, u: dyn.step(sys_, params, qp, qv, u))
    qp, qv = jnp.asarray(qpos), jnp.asarray(qvel)
    for t in range(40):
        d.ctrl[:] = ctrl[t]
        mujoco.mj_step(m, d)
        qp, qv, _ = step1(qp, qv, jnp.asarray(ctrl[t]))
    assert np.abs(np.asarray(qp) - d.qpos).max() < 5e-3


def test_stiction_and_coulomb_sliding():
    """Friction: below μmg an object sticks; above, Coulomb acceleration."""
    xml = """
    <mujoco>
      <option timestep="0.002" gravity="0 0 -9.81"/>
      <worldbody>
        <geom type="plane" size="5 5 .1" friction="0.5"/>
        <body pos="0 0 0.1">
          <joint type="slide" axis="1 0 0" damping="0"/>
          <joint type="slide" axis="0 0 1" damping="0"/>
          <geom type="sphere" size="0.1" friction="0.5" mass="1"/>
        </body>
      </worldbody>
      <actuator><motor joint="" gear="1" ctrlrange="-100 100"/></actuator>
    </mujoco>""".replace('joint=""', 'joint="px"').replace(
        '<joint type="slide" axis="1 0 0"', '<joint name="px" type="slide" axis="1 0 0"'
    )
    sys_ = system_from_mjcf(xml)
    params = dyn.RigidParams.default(sys_)
    stepn = jax.jit(lambda qp, qv, u: dyn.step_n(sys_, params, qp, qv, u, 50))

    def run(force):
        qp, qv = jnp.asarray(sys_.default_qpos()), jnp.zeros(sys_.nv)
        for _ in range(10):  # 1 second total
            qp, qv = stepn(qp, qv, jnp.array([force]))
        return float(qp[0]), float(qv[0])

    x_stick, v_stick = run(3.0)   # μmg = 4.905 N
    assert abs(x_stick) < 5e-3 and abs(v_stick) < 1e-3
    x_slide, v_slide = run(8.0)   # a = (8 − 4.905)/1 ≈ 3.1 m/s²
    np.testing.assert_allclose(v_slide, 3.095, rtol=0.05)
    np.testing.assert_allclose(x_slide, 1.55, rtol=0.05)


def test_energy_sane_passive_settle():
    """Passive cheetah settles onto the floor without gaining energy."""
    _, sys_ = _load("half_cheetah")
    params = dyn.RigidParams.default(sys_)
    stepn = jax.jit(lambda qp, qv, u: dyn.step_n(sys_, params, qp, qv, u, 5))
    qp, qv = jnp.asarray(sys_.default_qpos()), jnp.zeros(sys_.nv)
    for _ in range(100):
        qp, qv = stepn(qp, qv, jnp.zeros(sys_.nu))
    assert bool(jnp.isfinite(qp).all())
    assert float(jnp.abs(qv).max()) < 0.5        # settled, not jittering
    assert -0.35 < float(qp[1]) < 0.05           # resting near the floor
