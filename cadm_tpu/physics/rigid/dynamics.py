"""Joint-space dynamics: mass matrix, bias forces, contacts, stepping.

Projected Newton–Euler formulation (exact, equivalent to CRBA/RNEA but
expressed as dense einsums over the (nb, nv) Jacobian tensors instead of
tree recursions — the TPU-friendly choice, see kinematics.py):

  M(q)   = Σ_b  m_b·J_linᵀJ_lin + J_rotᵀ I_w J_rot   (+ armature diag)
  c(q,v) = Σ_b  J_linᵀ m_b (v̇⁰_b − g) + J_rotᵀ (I_w ω̇⁰_b + ω_b × I_w ω_b)

where (v̇⁰, ω̇⁰) are COM accelerations at qacc = 0, obtained with a SINGLE
``jax.jvp`` through forward kinematics along the kinematic map q̇(q, v) —
autodiff replaces the RNEA recursion exactly.

Contacts are sphere/capsule-vs-plane with a velocity-level projected
Gauss–Seidel impulse solve (friction-cone projected, Baumgarte push-out),
the jit-safe counterpart of MuJoCo's PGS solver: contact count is static,
inactive contacts clamp to zero impulse.

Per-episode randomized physics enter ONLY through ``RigidParams`` (traced
data): global mass/damping scales (paper §5.1 mass/damping randomization)
and a per-actuator mask (CrippledAnt's zeroed leg, SURVEY.md §2.1).
"""
from __future__ import annotations

from typing import Tuple

import jax
import jax.numpy as jnp
import numpy as np
from flax import struct

from cadm_tpu.core.types import Array
from cadm_tpu.physics.rigid import math3d
from cadm_tpu.physics.rigid.kinematics import (
    FK,
    com_jacobians,
    forward_kinematics,
    geom_world,
    integrate_qpos,
    kinematic_map,
    point_jacobians,
)
from cadm_tpu.physics.rigid.system import (
    GEOM_CAPSULE,
    GEOM_SPHERE,
    HINGE,
    SLIDE,
    System,
)


@struct.dataclass
class RigidParams:
    """Per-episode hidden dynamics parameters (traced, vmapped over envs)."""

    mass_scale: Array      # () multiplies all body masses & inertias
    damping_scale: Array   # () multiplies all joint damping
    act_mask: Array        # (nu,) 1.0 normally; 0.0 for crippled actuators

    @staticmethod
    def default(sys: System) -> "RigidParams":
        return RigidParams(
            mass_scale=jnp.ones(()),
            damping_scale=jnp.ones(()),
            act_mask=jnp.ones((sys.nu,)),
        )


# --------------------------------------------------------------- dynamics --
def mass_matrix(sys: System, fk: FK, mass_scale: Array) -> Array:
    jlin, jrot = com_jacobians(sys, fk)
    m = jnp.asarray(sys.body_mass) * mass_scale
    iw = fk.inertia_w * mass_scale
    M = jnp.einsum("bdv,b,bdw->vw", jlin, m, jlin) + jnp.einsum(
        "bdv,bde,bew->vw", jrot, iw, jrot
    )
    M = 0.5 * (M + M.T)  # exact symmetry for the Cholesky downstream
    return M + jnp.diag(jnp.asarray(sys.dof_armature))


def bias_forces(
    sys: System, qpos: Array, qvel: Array, mass_scale: Array
) -> Array:
    """c(q, v): Coriolis/centrifugal + gyroscopic + gravity projection."""

    def com_vels(q):
        fk = forward_kinematics(sys, q)
        jlin, jrot = com_jacobians(sys, fk)
        v = jnp.einsum("bdv,v->bd", jlin, qvel)
        w = jnp.einsum("bdv,v->bd", jrot, qvel)
        return (v, w), (fk, jlin, jrot)

    qdot = kinematic_map(sys, qpos, qvel)
    (v, w), (vdot0, wdot0), (fk, jlin, jrot) = jax.jvp(
        com_vels, (qpos,), (qdot,), has_aux=True
    )
    m = jnp.asarray(sys.body_mass) * mass_scale
    iw = fk.inertia_w * mass_scale
    g = jnp.asarray(sys.gravity)
    f_lin = m[:, None] * (vdot0 - g)                       # (nb,3)
    torque = jnp.einsum("bde,be->bd", iw, wdot0) + jnp.cross(
        w, jnp.einsum("bde,be->bd", iw, w)
    )
    return jnp.einsum("bdv,bd->v", jlin, f_lin) + jnp.einsum(
        "bdv,bd->v", jrot, torque
    )


def passive_forces(
    sys: System, qpos: Array, qvel: Array, damping_scale: Array
) -> Array:
    """Joint springs + joint-limit penalties (MuJoCo passive/limit forces).

    Joint damping is NOT applied here — ``step`` integrates it implicitly
    through the (M + h·diag(B)) system matrix, matching MuJoCo's Euler
    integrator (essential for the stiff cheetah leg joints).
    """
    tau = jnp.zeros((sys.nv,))
    # per-joint passive springs and joint-limit penalty spring-dampers
    for j in range(sys.nj):
        jt = int(sys.jnt_type[j])
        if jt not in (HINGE, SLIDE):
            continue
        qadr = int(sys.jnt_qposadr[j])
        dadr = int(sys.jnt_dofadr[j])
        q = qpos[qadr]
        f = jnp.zeros(())
        k_spring = float(sys.jnt_stiffness[j])
        if k_spring > 0.0:
            f = f - k_spring * (q - float(sys.qpos_spring[qadr]))
        if bool(sys.jnt_limited[j]):
            lo, hi = float(sys.jnt_range[j, 0]), float(sys.jnt_range[j, 1])
            viol_hi = jnp.maximum(q - hi, 0.0)
            viol_lo = jnp.maximum(lo - q, 0.0)
            active = (viol_hi > 0) | (viol_lo > 0)
            f = f - sys.limit_stiffness * (viol_hi - viol_lo)
            f = f - sys.limit_damping * qvel[dadr] * active
        tau = tau.at[dadr].add(f)
    return tau


def actuation(sys: System, ctrl: Array, act_mask: Array) -> Array:
    """Joint torques from (clipped) controls through gears onto dofs."""
    lo = jnp.asarray(sys.act_ctrlrange[:, 0])
    hi = jnp.asarray(sys.act_ctrlrange[:, 1])
    force = jnp.clip(ctrl, lo, hi) * jnp.asarray(sys.act_gear) * act_mask
    tau = jnp.zeros((sys.nv,))
    dof_of_act = np.array(
        [int(sys.jnt_dofadr[int(j)]) for j in sys.act_joint], int
    )
    return tau.at[dof_of_act].add(force)


# --------------------------------------------------------------- contacts --
def _contact_points(sys: System) -> Tuple[np.ndarray, np.ndarray, np.ndarray]:
    """Static candidate contact list: (body, local offset, radius) per point.

    Spheres contribute their center; capsules contribute both axis endpoints
    (the standard two-point approximation of capsule-vs-plane).
    """
    bodies, offsets, radii, frictions = [], [], [], []
    for gi in range(sys.ng):
        gt = int(sys.geom_type[gi])
        b = int(sys.geom_body[gi])
        size = sys.geom_size[gi]
        gpos = sys.geom_pos[gi]
        gquat = sys.geom_quat[gi]
        Rg = _np_quat_mat(gquat)
        if gt == GEOM_SPHERE:
            bodies.append(b)
            offsets.append(gpos)
            radii.append(float(size[0]))
            frictions.append(float(sys.geom_friction[gi]))
        elif gt == GEOM_CAPSULE:
            half = float(size[1])
            for s in (-1.0, 1.0):
                bodies.append(b)
                offsets.append(gpos + Rg @ np.array([0.0, 0.0, s * half]))
                radii.append(float(size[0]))
                frictions.append(float(sys.geom_friction[gi]))
    if not bodies:
        return (
            np.zeros((0,), int),
            np.zeros((0, 3)),
            np.zeros((0,)),
            np.zeros((0,)),
        )
    return (
        np.array(bodies, int),
        np.array(offsets),
        np.array(radii),
        np.array(frictions),
    )


def _np_quat_mat(q):
    w, x, y, z = q
    return np.array(
        [
            [1 - 2 * (y * y + z * z), 2 * (x * y - w * z), 2 * (x * z + w * y)],
            [2 * (x * y + w * z), 1 - 2 * (x * x + z * z), 2 * (y * z - w * x)],
            [2 * (x * z - w * y), 2 * (y * z + w * x), 1 - 2 * (x * x + y * y)],
        ]
    )


def contact_solve(
    sys: System,
    fk: FK,
    M: Array,
    v_pred: Array,
    dt: float,
) -> Array:
    """Velocity-level PGS impulse solve against the ground plane z=0.

    Returns the post-contact qvel. Static contact count; inactive contacts
    (separation > 0) are clamped to zero normal impulse, so no data-dependent
    shapes leak into the jit trace.
    """
    c_body, c_off, c_rad, c_mu = _contact_points(sys)
    nc = len(c_body)
    if nc == 0:
        return v_pred

    p_world = fk.body_pos[c_body] + jnp.einsum(
        "cij,cj->ci", fk.body_rot[c_body], jnp.asarray(c_off)
    )
    phi = p_world[:, 2] - jnp.asarray(c_rad)  # signed separation
    contact_pt = p_world.at[:, 2].add(-jnp.asarray(c_rad))

    Jp = point_jacobians(sys, fk, contact_pt, c_body)  # (nc, 3, nv)
    # rows: x/y tangent, z normal — plane frame is world-aligned
    Jc = Jp.reshape(3 * nc, sys.nv)

    L = jax.scipy.linalg.cho_factor(M)
    MinvJt = jax.scipy.linalg.cho_solve(L, Jc.T)       # (nv, 3nc)
    A = Jc @ MinvJt                                     # (3nc, 3nc)
    A = A + 1e-6 * jnp.eye(3 * nc)
    b = Jc @ v_pred

    # Baumgarte push-out target on the normal component
    v_star = -sys.contact_stiffness / dt * jnp.minimum(phi, 0.0)
    active = (phi < 0.0).astype(jnp.float32)
    mu = jnp.asarray(c_mu)

    Adiag = jnp.diagonal(A)

    def contact_update(i, lam):
        iz, ix, iy = 3 * i + 2, 3 * i, 3 * i + 1
        # normal impulse (projected ≥ 0, zeroed when not penetrating)
        r = A[iz] @ lam + b[iz] - v_star[i]
        ln = jnp.maximum(lam[iz] - r / Adiag[iz], 0.0) * active[i]
        lam = lam.at[iz].set(ln)
        # friction impulses, projected onto the cone |λ_t| ≤ μ λ_n
        rx = A[ix] @ lam + b[ix]
        lx = lam[ix] - rx / Adiag[ix]
        ry = A[iy] @ lam + b[iy]
        ly = lam[iy] - ry / Adiag[iy]
        t_norm = jnp.sqrt(lx * lx + ly * ly) + 1e-9
        scale = jnp.minimum(1.0, mu[i] * ln / t_norm)
        return lam.at[ix].set(lx * scale).at[iy].set(ly * scale)

    def sweep(_, lam):
        return jax.lax.fori_loop(0, nc, contact_update, lam)

    lam = jax.lax.fori_loop(
        0, sys.solver_iters, sweep, jnp.zeros((3 * nc,))
    )
    return v_pred + MinvJt @ lam


# ------------------------------------------------------------------- step --
def step(
    sys: System,
    params: RigidParams,
    qpos: Array,
    qvel: Array,
    ctrl: Array,
) -> Tuple[Array, Array]:
    """One physics substep (semi-implicit Euler, like MuJoCo's Euler)."""
    fk = forward_kinematics(sys, qpos)
    M = mass_matrix(sys, fk, params.mass_scale)
    c = bias_forces(sys, qpos, qvel, params.mass_scale)
    B = jnp.asarray(sys.dof_damping) * params.damping_scale
    tau = (
        actuation(sys, ctrl, params.act_mask)
        + passive_forces(sys, qpos, qvel, params.damping_scale)
        - c
        - B * qvel
    )
    # implicit joint damping (MuJoCo Euler): (M + h·diag(B)) v̇ = τ − Bv − c
    M_eff = M + sys.dt * jnp.diag(B)
    qacc = jax.scipy.linalg.cho_solve(jax.scipy.linalg.cho_factor(M_eff), tau)
    v_pred = qvel + sys.dt * qacc
    v_post = contact_solve(sys, fk, M_eff, v_pred, sys.dt)
    qpos_new = integrate_qpos(sys, qpos, v_post, sys.dt)
    return qpos_new, v_post


def step_n(
    sys: System,
    params: RigidParams,
    qpos: Array,
    qvel: Array,
    ctrl: Array,
    n: int,
) -> Tuple[Array, Array]:
    """``n`` substeps under one control (the env frame_skip inner scan)."""

    def body(carry, _):
        qp, qv = carry
        qp, qv = step(sys, params, qp, qv, ctrl)
        return (qp, qv), None

    (qpos, qvel), _ = jax.lax.scan(body, (qpos, qvel), None, length=n)
    return qpos, qvel
