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

from typing import Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np
from flax import struct

from cadm_tpu.core.types import Array
from cadm_tpu.ops.linalg import spd_inverse
from cadm_tpu.physics.rigid import math3d
from cadm_tpu.physics.rigid.kinematics import (
    FK,
    FKVel,
    com_jacobians,
    forward_kinematics,
    forward_velocities,
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
    meta = _scalar_joint_meta(sys)
    if meta is None:
        return jnp.zeros((sys.nv,))
    qadr, dadr, k_spring, spring_ref, lo, hi, limited, scatter = meta
    q = qpos[qadr]          # static gather of 1-dof joint positions
    v = qvel[dadr]
    f = -k_spring * (q - spring_ref)
    viol_hi = jnp.maximum(q - hi, 0.0)
    viol_lo = jnp.maximum(lo - q, 0.0)
    active = limited * ((viol_hi > 0) | (viol_lo > 0))
    f = f - sys.limit_stiffness * (viol_hi - viol_lo) * limited
    f = f - sys.limit_damping * v * active
    # static one-hot scatter into dof space (a matmul, not a scatter op)
    return f @ scatter


from functools import lru_cache


@lru_cache(maxsize=None)
def _act_matrix(sys: System) -> np.ndarray:
    """(nu, nv) static one-hot map from actuators onto their dofs."""
    mat = np.zeros((sys.nu, sys.nv))
    for a in range(sys.nu):
        mat[a, int(sys.jnt_dofadr[int(sys.act_joint[a])])] = 1.0
    return mat


@lru_cache(maxsize=None)
def _scalar_joint_meta(sys: System):
    """Static vectorized metadata for all 1-dof (hinge/slide) joints."""
    rows = [
        j for j in range(sys.nj) if int(sys.jnt_type[j]) in (HINGE, SLIDE)
    ]
    if not rows:
        return None
    qadr = np.array([int(sys.jnt_qposadr[j]) for j in rows])
    dadr = np.array([int(sys.jnt_dofadr[j]) for j in rows])
    k_spring = np.array([float(sys.jnt_stiffness[j]) for j in rows])
    spring_ref = np.array([float(sys.qpos_spring[q]) for q in qadr])
    lo = np.array([float(sys.jnt_range[j, 0]) for j in rows])
    hi = np.array([float(sys.jnt_range[j, 1]) for j in rows])
    limited = np.array([float(sys.jnt_limited[j]) for j in rows])
    scatter = np.zeros((len(rows), sys.nv))
    for i, d in enumerate(dadr):
        scatter[i, d] = 1.0
    return qadr, dadr, k_spring, spring_ref, lo, hi, limited, scatter


def actuation(sys: System, ctrl: Array, act_mask: Array) -> Array:
    """Joint torques from (clipped) controls through gears onto dofs."""
    lo = jnp.asarray(sys.act_ctrlrange[:, 0])
    hi = jnp.asarray(sys.act_ctrlrange[:, 1])
    force = jnp.clip(ctrl, lo, hi) * jnp.asarray(sys.act_gear) * act_mask
    return force @ jnp.asarray(_act_matrix(sys))


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
    Minv: Array,
    v_pred: Array,
    dt: float,
    lam0: Optional[Array] = None,
    iters: Optional[int] = None,
) -> Tuple[Array, Array]:
    """Velocity-level PGS impulse solve against the ground plane z=0.

    Returns (post-contact qvel, impulses λ). Static contact count; inactive
    contacts (separation > 0) are clamped to zero normal impulse, so no
    data-dependent shapes leak into the jit trace. ``Minv`` is the explicit
    inverse of the (damping-augmented) mass matrix, so the Delassus operator
    and the impulse back-substitution are plain batched matmuls (MXU work).

    ``lam0``: warm-start impulses (3nc,), e.g. the previous substep's λ —
    contacts persist across the frame_skip substeps, so warm-started sweeps
    converge in a fraction of the cold iteration count (the PGS solve is
    ~80% of the humanoid substep; see PARITY.md).

    Solver shape: Gauss–Seidel sweeps (lax.fori_loop) over a STATICALLY
    unrolled contact list — all index arithmetic is compile-time, no dynamic
    slicing in the hot loop.
    """
    c_body, c_off, c_rad, c_mu = _contact_points(sys)
    nc = len(c_body)
    if nc == 0:
        return v_pred, jnp.zeros((0,))

    p_world = fk.body_pos[c_body] + jnp.einsum(
        "cij,cj->ci", fk.body_rot[c_body], jnp.asarray(c_off)
    )
    phi = p_world[:, 2] - jnp.asarray(c_rad)  # signed separation
    contact_pt = p_world.at[:, 2].add(-jnp.asarray(c_rad))

    Jp = point_jacobians(sys, fk, contact_pt, c_body)  # (nc, 3, nv)
    # rows: x/y tangent, z normal — plane frame is world-aligned
    Jc = Jp.reshape(3 * nc, sys.nv)

    MinvJt = Minv @ Jc.T                                # (nv, 3nc) matmul
    A = Jc @ MinvJt + 1e-6 * jnp.eye(3 * nc)            # Delassus (3nc,3nc)
    b = Jc @ v_pred

    # Baumgarte push-out target on the normal component
    v_star = -sys.contact_stiffness / dt * jnp.minimum(phi, 0.0)
    active_mu = (phi < 0.0).astype(jnp.float32) * jnp.asarray(c_mu)

    if lam0 is None:
        lam0 = jnp.zeros((3 * nc,))
    # a warm-started impulse is only valid while its contact is active
    lam0 = lam0 * jnp.repeat(active_mu > 0.0, 3)
    lam = _pgs_dispatch(sys, iters)(A, b, v_star, active_mu, lam0)
    return v_pred + MinvJt @ lam, lam


@lru_cache(maxsize=None)
def _pgs_dispatch(sys: System, iters: Optional[int] = None):
    """PGS solve that is a Pallas kernel under vmap, XLA loop otherwise.

    ``contact_solve`` is written per-env; the collect loop vmaps it over
    thousands of envs. jax.custom_batching swaps the vmapped path for the
    VMEM-resident Pallas kernel (ops/pgs.py) — the unbatched fallback keeps
    single-env debugging and CPU use simple. ``iters`` overrides the sweep
    count (warm-started substeps use sys.solver_iters_warm).
    """
    nc = len(_contact_points(sys)[0])
    iters = sys.solver_iters if iters is None else iters

    @jax.custom_batching.custom_vmap
    def solve(A, b, v_star, active_mu, lam0):
        return solve_xla(A, b, v_star, active_mu, lam0)

    def solve_xla(A, b, v_star, active_mu, lam0):
        # plain-XLA version (used per-env, and batched on non-TPU backends
        # where Pallas would fall back to the slow interpreter)
        Adiag = jnp.diagonal(A)

        def sweep(_, lam):
            for i in range(nc):
                iz, ix, iy = 3 * i + 2, 3 * i, 3 * i + 1
                active = (active_mu[i] > 0.0).astype(lam.dtype)
                r = A[iz] @ lam + b[iz] - v_star[i]
                ln = jnp.maximum(lam[iz] - r / Adiag[iz], 0.0) * active
                lam = lam.at[iz].set(ln)
                rx = A[ix] @ lam + b[ix]
                lx = lam[ix] - rx / Adiag[ix]
                ry = A[iy] @ lam + b[iy]
                ly = lam[iy] - ry / Adiag[iy]
                t_norm = jnp.sqrt(lx * lx + ly * ly) + 1e-9
                scale = jnp.minimum(1.0, active_mu[i] * ln / t_norm)
                lam = lam.at[ix].set(lx * scale).at[iy].set(ly * scale)
            return lam

        return jax.lax.fori_loop(0, iters, sweep, lam0)

    def kernel_branch(A, b, v_star, active_mu, lam0):
        from cadm_tpu.ops.pgs import pgs_solve

        return pgs_solve(A, b, v_star, active_mu, lam0, nc=nc, iters=iters)

    def xla_branch(A, b, v_star, active_mu, lam0):
        return jax.vmap(solve_xla)(A, b, v_star, active_mu, lam0)

    @solve.def_vmap
    def _solve_vmap(axis_size, in_batched, A, b, v_star, active_mu, lam0):
        # per-platform lowering: Pallas kernel on TPU, plain XLA elsewhere
        lam = jax.lax.platform_dependent(
            A, b, v_star, active_mu, lam0,
            tpu=kernel_branch, default=xla_branch,
        )
        return lam, True

    return solve


@lru_cache(maxsize=None)
def _fkvel_dispatch(sys: System):
    """forward_velocities that becomes the fused Pallas kernel under vmap.

    Per-env (unbatched) and non-TPU backends use the pure-JAX tree walk;
    the vmapped TPU path runs ops/fk_kernel.py and reassembles the FKVel
    pytree (rotation matrices / world inertias are two batched XLA ops).
    """

    @jax.custom_batching.custom_vmap
    def fkvel(qpos, qvel):
        return forward_velocities(sys, qpos, qvel)

    def kernel_branch(qpos, qvel):
        from cadm_tpu.ops.fk_kernel import fk_vel_pallas

        d = fk_vel_pallas(sys, qpos, qvel)
        quat = d["quat"]
        body_rot = math3d.quat_to_mat(quat)
        R_i = math3d.quat_to_mat(
            math3d.quat_mul(quat, jnp.asarray(sys.body_iquat))
        )
        inertia_w = jnp.einsum(
            "ebij,bj,ebkj->ebik", R_i, jnp.asarray(sys.body_inertia), R_i
        )
        return FKVel(
            body_pos=d["pos"],
            body_rot=body_rot,
            com=d["com"],
            inertia_w=inertia_w,
            dof_axis=d["dof_axis"],
            dof_anchor=d["dof_anchor"],
            omega=d["omega"],
            v_com=d["v_com"],
            alpha0=d["alpha0"],
            a_com0=d["a_com0"],
        )

    def pure_branch(qpos, qvel):
        return jax.vmap(lambda qp, qv: forward_velocities(sys, qp, qv))(
            qpos, qvel
        )

    @fkvel.def_vmap
    def _rule(axis_size, in_batched, qpos, qvel):
        # branch selection at LOWERING time, per platform — a program traced
        # on TPU but lowered for CPU (e.g. jax.default_device) still works
        out = jax.lax.platform_dependent(
            qpos, qvel, tpu=kernel_branch, default=pure_branch
        )
        return out, jax.tree.map(lambda _: True, out)

    return fkvel


@lru_cache(maxsize=None)
def _smooth_dispatch(sys: System):
    """Smooth-dynamics stage (everything before contacts) with kernel fusion.

    Returns (fkv, Minv, v_pred). Unbatched / non-TPU / large-nv systems use
    the composed pure-JAX path; the vmapped TPU path for nv ≤ FULL_DYN_MAX_NV
    runs the single fused Pallas kernel (ops/fk_kernel.full_dyn_pallas):
    FK + inertia + mass matrix + bias projection + actuation/passive +
    implicit damping + Cholesky inverse + v_pred with zero HBM round-trips.
    """

    def pure_one(qpos, qvel, ctrl, ms, ds, am):
        fkv = forward_velocities(sys, qpos, qvel)
        M = mass_matrix(sys, fkv, ms)
        c = bias_from_fkvel(sys, fkv, ms)
        B = jnp.asarray(sys.dof_damping) * ds
        tau = (
            actuation(sys, ctrl, am)
            + passive_forces(sys, qpos, qvel, ds)
            - c
            - B * qvel
        )
        Minv = spd_inverse(M + sys.dt * jnp.diag(B))
        v_pred = qvel + sys.dt * (Minv @ tau)
        return fkv, Minv, v_pred

    @jax.custom_batching.custom_vmap
    def smooth(qpos, qvel, ctrl, ms, ds, am):
        return pure_one(qpos, qvel, ctrl, ms, ds, am)

    def kernel_branch(qpos, qvel, ctrl, ms, ds, am):
        from cadm_tpu.ops.fk_kernel import full_dyn_pallas

        d = full_dyn_pallas(sys, qpos, qvel, ctrl, ms, ds, am)
        quat = d["quat"]
        body_rot = math3d.quat_to_mat(quat)
        R_i = math3d.quat_to_mat(
            math3d.quat_mul(quat, jnp.asarray(sys.body_iquat))
        )
        inertia_w = jnp.einsum(
            "ebij,bj,ebkj->ebik", R_i, jnp.asarray(sys.body_inertia), R_i
        )
        fkv = FKVel(
            body_pos=d["pos"], body_rot=body_rot, com=d["com"],
            inertia_w=inertia_w, dof_axis=d["dof_axis"],
            dof_anchor=d["dof_anchor"], omega=d["omega"], v_com=d["v_com"],
            alpha0=d["alpha0"], a_com0=d["a_com0"],
        )
        return fkv, d["minv"], d["v_pred"][..., 0]

    def pure_branch(qpos, qvel, ctrl, ms, ds, am):
        return jax.vmap(pure_one)(qpos, qvel, ctrl, ms, ds, am)

    from cadm_tpu.ops.fk_kernel import FULL_DYN_MAX_NV

    @smooth.def_vmap
    def _rule(axis_size, in_batched, qpos, qvel, ctrl, ms, ds, am):
        # constants closed over inside the vmapped caller (e.g. a default
        # act_mask) arrive unbatched — broadcast them to the batch
        args = [
            x if b else jnp.broadcast_to(x, (axis_size,) + jnp.shape(x))
            for x, b in zip((qpos, qvel, ctrl, ms, ds, am), in_batched)
        ]
        if sys.nv <= FULL_DYN_MAX_NV:
            out = jax.lax.platform_dependent(
                *args, tpu=kernel_branch, default=pure_branch
            )
        else:
            out = pure_branch(*args)
        return out, jax.tree.map(lambda _: True, out)

    return smooth


def bias_from_fkvel(sys: System, fkv: FKVel, mass_scale: Array) -> Array:
    """Generalized bias forces from the analytic propagation quantities."""
    jlin, jrot = com_jacobians(sys, fkv)
    m = jnp.asarray(sys.body_mass) * mass_scale
    iw = fkv.inertia_w * mass_scale
    g = jnp.asarray(sys.gravity)
    f_lin = m[:, None] * (fkv.a_com0 - g)
    torque = jnp.einsum("bde,be->bd", iw, fkv.alpha0) + jnp.cross(
        fkv.omega, jnp.einsum("bde,be->bd", iw, fkv.omega)
    )
    return jnp.einsum("bdv,bd->v", jlin, f_lin) + jnp.einsum(
        "bdv,bd->v", jrot, torque
    )


# ------------------------------------------------------------------- step --
def step(
    sys: System,
    params: RigidParams,
    qpos: Array,
    qvel: Array,
    ctrl: Array,
    lam0: Optional[Array] = None,
    warm: bool = False,
) -> Tuple[Array, Array, Array]:
    """One physics substep (semi-implicit Euler, like MuJoCo's Euler).

    Returns (qpos, qvel, λ). ``lam0`` warm-starts the contact solve (pass
    the previous substep's λ — see ``step_n``); ``warm=True`` additionally
    runs the reduced sys.solver_iters_warm sweep count.
    """
    # smooth stage (FK, mass matrix, bias, actuation/passive, implicit
    # damping, SPD inverse, v_pred) — one fused Pallas kernel on the TPU
    # batched path, composed pure-JAX otherwise (see _smooth_dispatch)
    fk, Minv, v_pred = _smooth_dispatch(sys)(
        qpos, qvel, ctrl,
        params.mass_scale, params.damping_scale, params.act_mask,
    )
    v_post, lam = contact_solve(
        sys, fk, Minv, v_pred, sys.dt, lam0,
        iters=sys.solver_iters_warm if warm else None,
    )
    qpos_new = integrate_qpos(sys, qpos, v_post, sys.dt)
    return qpos_new, v_post, lam


def step_n(
    sys: System,
    params: RigidParams,
    qpos: Array,
    qvel: Array,
    ctrl: Array,
    n: int,
) -> Tuple[Array, Array]:
    """``n`` substeps under one control (the env frame_skip inner scan).

    The first substep solves contacts cold at the full sweep count; the
    remaining substeps warm-start from the previous λ (persistent-contact
    assumption over the ~1 ms substep) and run sys.solver_iters_warm sweeps
    — the PGS solve is ~80% of a contact-rich substep, so this roughly
    halves the frame cost at equal golden-test accuracy.
    """
    qpos, qvel, lam = step(sys, params, qpos, qvel, ctrl)

    def body(carry, _):
        qp, qv, lam = carry
        qp, qv, lam = step(sys, params, qp, qv, ctrl, lam, warm=True)
        return (qp, qv, lam), None

    (qpos, qvel, _), _ = jax.lax.scan(
        body, (qpos, qvel, lam), None, length=n - 1
    )
    return qpos, qvel
