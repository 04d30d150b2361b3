"""Contact-PHASE golden parity vs MuJoCo (VERDICT r1 item 8, SURVEY §4.1).

Round 1 validated smooth terms and in-air flight; these tests compare
trajectories THROUGH ground contact for all four rigid families, with
explicit divergence budgets (~2x the observed round-2 divergence):

- passive drop/settle: early-impact divergence, rest height, and deepest
  root excursion (penetration proxy) vs MuJoCo;
- actuated contact-rich rollouts (cheetah/hopper): bounded qpos divergence.

Solver semantics legitimately differ (PGS/Baumgarte penalty vs MuJoCo's
soft-constraint Newton), so budgets are behavioral, not bitwise. The
slim-humanoid comparison is impact-phase only: after it crumples, the pile
configuration is chaotic and solver-specific (MuJoCo itself lands at a
different pile height across seeds).
"""
import os

import jax
import jax.numpy as jnp
import numpy as np
import pytest

mujoco = pytest.importorskip("mujoco")

from cadm_tpu.physics.rigid import dynamics as dyn
from cadm_tpu.physics.rigid.mjcf import system_from_mjcf

ASSETS = os.path.join(
    os.path.dirname(__file__), "..", "cadm_tpu", "envs", "assets"
)
ANT_INIT = np.array([0, 0, 0.55, 1, 0, 0, 0, 0, 1.0, 0, -1.0, 0, -1.0, 0, 1.0])


def _load(name):
    xml = open(os.path.join(ASSETS, f"{name}.xml")).read()
    return mujoco.MjModel.from_xml_string(xml), system_from_mjcf(xml)


def _drop_setup(name):
    m, sys_ = _load(name)
    d = mujoco.MjData(m)
    base = ANT_INIT.copy() if name == "ant" else m.qpos0.copy()
    zi = 1 if m.jnt_type[0] != 0 else 2  # root height index (planar vs free)
    qpos = base.copy()
    qpos[zi] += 0.15
    d.qpos[:] = qpos
    d.qvel[:] = 0
    params = dyn.RigidParams.default(sys_)
    step1 = jax.jit(lambda qp, qv, u: dyn.step(sys_, params, qp, qv, u))
    return m, sys_, d, step1, jnp.asarray(qpos), zi


def _run_both(m, sys_, d, step1, qp0, zi, steps, ctrl_fn):
    qp, qv = qp0, jnp.zeros(sys_.nv)
    div, z_mj, z_jx = [], [], []
    for t in range(steps):
        u = ctrl_fn(t, m.nu)
        d.ctrl[:] = u
        mujoco.mj_step(m, d)
        qp, qv, _ = step1(qp, qv, jnp.asarray(u))
        div.append(float(np.abs(np.asarray(qp) - d.qpos).max()))
        z_mj.append(float(d.qpos[zi]))
        z_jx.append(float(qp[zi]))
    return np.array(div), np.array(z_mj), np.array(z_jx), qv


ZERO = lambda t, nu: np.zeros(nu)
SINE = lambda t, nu: 0.3 * np.sin(0.02 * t + np.arange(nu))


@pytest.mark.parametrize("name", ["half_cheetah", "hopper", "ant"])
def test_passive_drop_settle_matches_mujoco(name):
    m, sys_, d, step1, qp0, zi = _drop_setup(name)
    div, z_mj, z_jx, qv = _run_both(m, sys_, d, step1, qp0, zi, 600, ZERO)
    # early impact phase tracks closely
    assert div[49] < 0.12, f"impact divergence {div[49]:.3f}"
    # rest height parity (mean over the settled tail)
    assert abs(z_mj[-100:].mean() - z_jx[-100:].mean()) < 0.08
    # deepest root excursion (penetration proxy) parity
    assert abs(z_mj.min() - z_jx.min()) < 0.08
    # settled: no residual jitter or energy gain
    assert float(jnp.abs(qv).max()) < 0.3


def test_slim_humanoid_impact_phase_matches_mujoco():
    m, sys_, d, step1, qp0, zi = _drop_setup("slim_humanoid")
    div, z_mj, z_jx, _ = _run_both(m, sys_, d, step1, qp0, zi, 150, ZERO)
    assert div[49] < 0.06, f"impact divergence {div[49]:.3f}"
    # deepest excursion during the fall+first-impact window
    assert abs(z_mj.min() - z_jx.min()) < 0.08
    # both engines agree the humanoid is mid-collapse by 150 substeps
    assert z_mj[-1] < float(qp0[zi]) - 0.25
    assert z_jx[-1] < float(qp0[zi]) - 0.25


@pytest.mark.parametrize(
    "name,budget", [("half_cheetah", 0.15), ("hopper", 0.35)]
)
def test_actuated_contact_rollout_bounded_divergence(name, budget):
    """Actuated, contact-rich trajectories: bounded qpos divergence over
    150 substeps (0.15-0.3 s of contact-rich motion)."""
    m, sys_, d, step1, qp0, zi = _drop_setup(name)
    div, z_mj, z_jx, _ = _run_both(m, sys_, d, step1, qp0, zi, 150, SINE)
    assert div[149] < budget, f"{name} divergence {div[149]:.3f}"
    # the root-height traces stay correlated through contact
    c = np.corrcoef(z_mj, z_jx)[0, 1]
    assert c > 0.9, f"root-height correlation {c:.3f}"


@pytest.mark.parametrize("name", ["half_cheetah", "slim_humanoid"])
def test_warm_start_reduced_sweeps_matches_cold_path(name):
    """The production frame path (step_n: cold first substep, then
    warm-started solver_iters_warm sweeps) must track the all-cold
    full-iteration path through drop + settle within a tight budget —
    the physics-accuracy gate for the warm-start optimization."""
    m, sys_, d, step1, qp0, zi = _drop_setup(name)
    params = dyn.RigidParams.default(sys_)
    n = 5
    stepn = jax.jit(lambda qp, qv, u: dyn.step_n(sys_, params, qp, qv, u, n))

    def cold5(qp, qv, u):
        for _ in range(n):
            qp, qv, _ = step1(qp, qv, u)
        return qp, qv

    qp_w = qp_c = qp0
    qv_w = qv_c = jnp.zeros(sys_.nv)
    u = jnp.zeros(sys_.nu)
    div = []
    for t in range(120):  # 600 substeps: fall, impact, settle
        qp_w, qv_w = stepn(qp_w, qv_w, u)
        qp_c, qv_c = cold5(qp_c, qv_c, u)
        div.append(float(jnp.abs(qp_w - qp_c).max()))
    assert div[-1] < 0.05, f"{name} warm-vs-cold divergence {div[-1]:.4f}"
    # same rest height and a settled (non-jittering) state on both paths
    assert abs(float(qp_w[zi]) - float(qp_c[zi])) < 0.02
    assert float(jnp.abs(qv_w).max()) < 0.3
