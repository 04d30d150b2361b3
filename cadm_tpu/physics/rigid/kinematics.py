"""Forward kinematics and Jacobian assembly.

FK walks the body tree ONCE (statically unrolled host loop over ≤14 bodies —
the only sequential piece of the pipeline) producing world body frames, COM
positions, world inertia tensors and, crucially, a reduction of EVERY degree
of freedom to a world-space (axis, anchor, is_rotational) triple:

- hinge DOF  → rotation about world axis a through anchor o
- slide DOF  → translation along world axis a
- free joint → 3 world-axis translations + 3 BODY-axis rotations about the
  body origin (MuJoCo's free-joint convention: linear qvel in world frame,
  angular qvel in body frame)

With that reduction, COM/point Jacobians, the joint-space mass matrix and
the bias forces are all dense masked einsums over (nb, nv)-shaped tensors —
no per-dof control flow — which is what lets the whole physics step fuse
into batched MXU/VPU work when vmapped over thousands of envs.

Replaces the role of MuJoCo's mj_kinematics/mj_comPos (reference L0,
SURVEY.md §1) with a formulation chosen for XLA rather than for CPUs.
"""
from __future__ import annotations

from typing import Tuple

import jax.numpy as jnp
import numpy as np
from flax import struct

from cadm_tpu.core.types import Array
from cadm_tpu.physics.rigid import math3d
from cadm_tpu.physics.rigid.system import FREE, HINGE, SLIDE, System


@struct.dataclass
class FK:
    body_pos: Array     # (nb,3) frame origins, world
    body_rot: Array     # (nb,3,3) frame rotations, world
    com: Array          # (nb,3) body COM, world
    inertia_w: Array    # (nb,3,3) rotational inertia about COM, world axes
    dof_axis: Array     # (nv,3) world axis per dof
    dof_anchor: Array   # (nv,3) world anchor per dof (rotational dofs)


def forward_kinematics(sys: System, qpos: Array) -> FK:
    """Tree walk carried entirely in (pos, quat) pairs.

    No 3×3 matrix products appear in the sequential chain — every step is
    quaternion arithmetic (pure elementwise + cross products), which XLA
    fuses into a handful of kernels even at batch thousands. Rotation
    matrices are materialized ONCE at the end in a single batched op.
    """
    nb, nv = sys.nb, sys.nv
    eye3 = jnp.eye(3)
    unit_quat = jnp.array([1.0, 0.0, 0.0, 0.0])

    pos = [jnp.zeros(3)] * nb
    quat = [unit_quat] * nb
    dof_axis = [None] * nv
    dof_anchor = [None] * nv

    for b in range(1, nb):
        p = int(sys.body_parent[b])
        q = math3d.quat_mul(quat[p], jnp.asarray(sys.body_quat[b]))
        x = pos[p] + math3d.quat_rotate(quat[p], jnp.asarray(sys.body_pos[b]))

        for j in np.nonzero(sys.jnt_body == b)[0]:
            jt = int(sys.jnt_type[j])
            qadr = int(sys.jnt_qposadr[j])
            dadr = int(sys.jnt_dofadr[j])
            if jt == FREE:
                x = qpos[qadr: qadr + 3]
                q = qpos[qadr + 3: qadr + 7]
                q = q / jnp.linalg.norm(q)
                # translational dofs: world axes; rotational dofs: BODY axes
                # about the body origin (MuJoCo free-joint convention)
                for i in range(3):
                    dof_axis[dadr + i] = eye3[i]
                    dof_anchor[dadr + i] = jnp.zeros(3)
                for i in range(3):
                    dof_axis[dadr + 3 + i] = math3d.quat_rotate(q, eye3[i])
                    dof_anchor[dadr + 3 + i] = x
            elif jt == SLIDE:
                a_w = math3d.quat_rotate(q, jnp.asarray(sys.jnt_axis[j]))
                x = x + a_w * (qpos[qadr] - sys.qpos0[qadr])
                dof_axis[dadr] = a_w
                dof_anchor[dadr] = x
            elif jt == HINGE:
                a_w = math3d.quat_rotate(q, jnp.asarray(sys.jnt_axis[j]))
                o_w = x + math3d.quat_rotate(q, jnp.asarray(sys.jnt_pos[j]))
                dq = math3d.quat_from_axis_angle(
                    a_w, qpos[qadr] - sys.qpos0[qadr]
                )
                q = math3d.quat_mul(dq, q)
                x = o_w + math3d.quat_rotate(dq, x - o_w)
                dof_axis[dadr] = a_w
                dof_anchor[dadr] = o_w
            else:
                raise NotImplementedError(f"joint type {jt}")
        pos[b] = x
        quat[b] = q

    body_pos = jnp.stack(pos)
    body_quat = jnp.stack(quat)
    body_rot = math3d.quat_to_mat(body_quat)  # one batched materialization
    com = body_pos + math3d.quat_rotate(
        body_quat, jnp.asarray(sys.body_ipos)
    )
    R_i = math3d.quat_to_mat(
        math3d.quat_mul(body_quat, jnp.asarray(sys.body_iquat))
    )
    inertia_w = jnp.einsum(
        "bij,bj,bkj->bik", R_i, jnp.asarray(sys.body_inertia), R_i
    )
    return FK(
        body_pos=body_pos,
        body_rot=body_rot,
        com=com,
        inertia_w=inertia_w,
        dof_axis=jnp.stack(dof_axis),
        dof_anchor=jnp.stack(dof_anchor),
    )


@struct.dataclass
class FKVel(FK):
    """FK extended with body velocities and zero-qacc bias accelerations.

    The analytic replacement for jvp-through-FK (see dynamics.bias_forces):
    one extra downward propagation pass computes, per body,
      omega   (nb,3) world angular velocity
      v_com   (nb,3) COM linear velocity
      alpha0  (nb,3) angular acceleration at q̈ = 0
      a_com0  (nb,3) COM linear acceleration at q̈ = 0
    exactly (standard rigid-chain composition rules; free-joint dofs use the
    MuJoCo body-frame-ω convention, whose zero-q̈ α is identically zero).
    """

    omega: Array
    v_com: Array
    alpha0: Array
    a_com0: Array


def forward_velocities(sys: System, qpos: Array, qvel: Array) -> FKVel:
    """FK + velocity/bias-acceleration propagation in one tree walk."""
    nb, nv = sys.nb, sys.nv
    eye3 = jnp.eye(3)
    unit_quat = jnp.array([1.0, 0.0, 0.0, 0.0])
    z3 = jnp.zeros(3)

    pos = [z3] * nb
    quat = [unit_quat] * nb
    w = [z3] * nb       # world angular velocity
    vx = [z3] * nb      # velocity of body frame origin
    al = [z3] * nb      # angular acceleration (qdd = 0)
    ax = [z3] * nb      # linear acceleration of frame origin (qdd = 0)
    dof_axis = [None] * nv
    dof_anchor = [None] * nv

    for b in range(1, nb):
        p = int(sys.body_parent[b])
        q = math3d.quat_mul(quat[p], jnp.asarray(sys.body_quat[b]))
        x = pos[p] + math3d.quat_rotate(quat[p], jnp.asarray(sys.body_pos[b]))
        # fixed offset: origin is a material point of the parent
        rel = x - pos[p]
        om, alp = w[p], al[p]
        v = vx[p] + jnp.cross(om, rel)
        a = ax[p] + jnp.cross(alp, rel) + jnp.cross(om, jnp.cross(om, rel))

        for j in np.nonzero(sys.jnt_body == b)[0]:
            jt = int(sys.jnt_type[j])
            qadr = int(sys.jnt_qposadr[j])
            dadr = int(sys.jnt_dofadr[j])
            if jt == FREE:
                x = qpos[qadr: qadr + 3]
                q = qpos[qadr + 3: qadr + 7]
                q = q / jnp.linalg.norm(q)
                v = qvel[dadr: dadr + 3]
                om_body = qvel[dadr + 3: dadr + 6]
                om = math3d.quat_rotate(q, om_body)
                alp = z3  # Σ q̇ᵢ (ω × aᵢ) = ω × ω = 0
                a = z3
                for i in range(3):
                    dof_axis[dadr + i] = eye3[i]
                    dof_anchor[dadr + i] = z3
                for i in range(3):
                    dof_axis[dadr + 3 + i] = math3d.quat_rotate(q, eye3[i])
                    dof_anchor[dadr + 3 + i] = x
            elif jt == SLIDE:
                a_w = math3d.quat_rotate(q, jnp.asarray(sys.jnt_axis[j]))
                s = qpos[qadr] - sys.qpos0[qadr]
                sd = qvel[dadr]
                x = x + a_w * s
                # axis is fixed in the pre-joint frame: ȧ = ω × a
                wxa = jnp.cross(om, a_w)
                v = v + wxa * s + a_w * sd
                a = (
                    a
                    + jnp.cross(alp, a_w) * s
                    + jnp.cross(om, wxa) * s
                    + 2.0 * wxa * sd
                )
                dof_axis[dadr] = a_w
                dof_anchor[dadr] = x
            elif jt == HINGE:
                a_w = math3d.quat_rotate(q, jnp.asarray(sys.jnt_axis[j]))
                o_w = x + math3d.quat_rotate(q, jnp.asarray(sys.jnt_pos[j]))
                th = qpos[qadr] - sys.qpos0[qadr]
                thd = qvel[dadr]
                dq = math3d.quat_from_axis_angle(a_w, th)
                q = math3d.quat_mul(dq, q)
                # anchor point kinematics (material point of pre-joint frame)
                rel_o = o_w - x
                v_o = v + jnp.cross(om, rel_o)
                a_o = (
                    a
                    + jnp.cross(alp, rel_o)
                    + jnp.cross(om, jnp.cross(om, rel_o))
                )
                x = o_w + math3d.quat_rotate(dq, x - o_w)
                # post-joint angular state
                om_new = om + a_w * thd
                alp_new = alp + jnp.cross(om, a_w) * thd
                # new origin is a material point of the post-joint body
                rel_n = x - o_w
                v = v_o + jnp.cross(om_new, rel_n)
                a = (
                    a_o
                    + jnp.cross(alp_new, rel_n)
                    + jnp.cross(om_new, jnp.cross(om_new, rel_n))
                )
                om, alp = om_new, alp_new
                dof_axis[dadr] = a_w
                dof_anchor[dadr] = o_w
            else:
                raise NotImplementedError(f"joint type {jt}")
        pos[b], quat[b] = x, q
        w[b], vx[b], al[b], ax[b] = om, v, alp, a

    body_pos = jnp.stack(pos)
    body_quat = jnp.stack(quat)
    body_rot = math3d.quat_to_mat(body_quat)
    com = body_pos + math3d.quat_rotate(body_quat, jnp.asarray(sys.body_ipos))
    R_i = math3d.quat_to_mat(
        math3d.quat_mul(body_quat, jnp.asarray(sys.body_iquat))
    )
    inertia_w = jnp.einsum(
        "bij,bj,bkj->bik", R_i, jnp.asarray(sys.body_inertia), R_i
    )
    omega = jnp.stack(w)
    alpha0 = jnp.stack(al)
    rel_c = com - body_pos
    v_com = jnp.stack(vx) + jnp.cross(omega, rel_c)
    a_com0 = (
        jnp.stack(ax)
        + jnp.cross(alpha0, rel_c)
        + jnp.cross(omega, jnp.cross(omega, rel_c))
    )
    return FKVel(
        body_pos=body_pos,
        body_rot=body_rot,
        com=com,
        inertia_w=inertia_w,
        dof_axis=jnp.stack(dof_axis),
        dof_anchor=jnp.stack(dof_anchor),
        omega=omega,
        v_com=v_com,
        alpha0=alpha0,
        a_com0=a_com0,
    )


def _dof_is_rot(sys: System) -> np.ndarray:
    """(nv,) static bool — rotational (hinge-like) vs translational dofs."""
    out = np.zeros((sys.nv,), bool)
    for j in range(sys.nj):
        jt = int(sys.jnt_type[j])
        d = int(sys.jnt_dofadr[j])
        if jt == FREE:
            out[d + 3: d + 6] = True
        elif jt == HINGE:
            out[d] = True
    return out


def point_jacobians(
    sys: System, fk: FK, points: Array, point_body: np.ndarray
) -> Array:
    """Translational Jacobians of world points attached to bodies.

    points: (n, 3) world positions; point_body: (n,) static body indices.
    Returns (n, 3, nv). Columns: rot dof → a × (p − o); trans dof → a.
    """
    mask = jnp.asarray(
        sys.ancestry_mask()[point_body].astype(np.float32)
    )  # (n, nv)
    is_rot = jnp.asarray(_dof_is_rot(sys).astype(np.float32))  # (nv,)
    a = fk.dof_axis          # (nv,3)
    o = fk.dof_anchor        # (nv,3)
    rel = points[:, None, :] - o[None, :, :]          # (n, nv, 3)
    rot_col = jnp.cross(a[None], rel)                 # (n, nv, 3)
    col = is_rot[None, :, None] * rot_col + (1 - is_rot)[None, :, None] * a[None]
    return jnp.einsum("nvd,nv->ndv", col, mask)


def com_jacobians(sys: System, fk: FK) -> Tuple[Array, Array]:
    """(Jlin, Jrot), each (nb, 3, nv), at body COMs."""
    mask = jnp.asarray(sys.ancestry_mask().astype(np.float32))  # (nb, nv)
    is_rot = jnp.asarray(_dof_is_rot(sys).astype(np.float32))
    a = fk.dof_axis
    o = fk.dof_anchor
    rel = fk.com[:, None, :] - o[None, :, :]
    rot_col = jnp.cross(a[None], rel)
    lin_col = is_rot[None, :, None] * rot_col + (1 - is_rot)[None, :, None] * a[None]
    jlin = jnp.einsum("bvd,bv->bdv", lin_col, mask)
    jrot = jnp.einsum("vd,bv,v->bdv", a, mask, is_rot)
    return jlin, jrot


def geom_world(sys: System, fk: FK) -> Tuple[Array, Array]:
    """World (pos, rot) of every collision geom."""
    gb = sys.geom_body
    pos = fk.body_pos[gb] + jnp.einsum(
        "gij,gj->gi", fk.body_rot[gb], jnp.asarray(sys.geom_pos)
    )
    rot = fk.body_rot[gb] @ math3d.quat_to_mat(jnp.asarray(sys.geom_quat))
    return pos, rot


def kinematic_map(sys: System, qpos: Array, qvel: Array) -> Array:
    """q̇pos from qvel (quaternion kinematics for free joints)."""
    out = []
    for j in range(sys.nj):
        jt = int(sys.jnt_type[j])
        qadr = int(sys.jnt_qposadr[j])
        dadr = int(sys.jnt_dofadr[j])
        if jt == FREE:
            out.append(qvel[dadr: dadr + 3])
            quat = qpos[qadr + 3: qadr + 7]
            out.append(math3d.quat_deriv_local(quat, qvel[dadr + 3: dadr + 6]))
        else:
            out.append(qvel[dadr: dadr + 1])
    return jnp.concatenate(out)


def integrate_qpos(sys: System, qpos: Array, qvel: Array, dt: float) -> Array:
    """Semi-implicit position update (quat exponential for free joints)."""
    out = []
    for j in range(sys.nj):
        jt = int(sys.jnt_type[j])
        qadr = int(sys.jnt_qposadr[j])
        dadr = int(sys.jnt_dofadr[j])
        if jt == FREE:
            out.append(qpos[qadr: qadr + 3] + dt * qvel[dadr: dadr + 3])
            out.append(
                math3d.quat_integrate_local(
                    qpos[qadr + 3: qadr + 7], qvel[dadr + 3: dadr + 6], dt
                )
            )
        else:
            out.append(qpos[qadr: qadr + 1] + dt * qvel[dadr: dadr + 1])
    return jnp.concatenate(out)
