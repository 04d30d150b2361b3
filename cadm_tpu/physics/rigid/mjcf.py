"""MJCF → System conversion (host-side, setup time only).

Parses an MJCF model with the ``mujoco`` python package (available in this
image; the reference's own L0 dependency, SURVEY.md §1) and extracts the
numeric description into a pure-numpy :class:`System`. Stepping never touches
MuJoCo — this is a build-time tool, also used by the golden-trajectory parity
tests (SURVEY §4.1). Gated import: the framework runs without mujoco if you
construct Systems directly.

Supported subset: FREE/SLIDE/HINGE joints, sphere/capsule collision geoms vs
a world plane, joint-torque motors. That covers the CaDM control suite
(HalfCheetah, Ant, Hopper, SlimHumanoid).
"""
from __future__ import annotations

import numpy as np

from cadm_tpu.physics.rigid.system import (
    FREE,
    GEOM_CAPSULE,
    GEOM_PLANE,
    GEOM_SPHERE,
    HINGE,
    SLIDE,
    System,
)

_MJ_GEOM = {0: GEOM_PLANE, 2: GEOM_SPHERE, 3: GEOM_CAPSULE}


def system_from_mjcf(xml: str, **overrides) -> System:
    """Build a System from an MJCF string."""
    import mujoco  # local import: optional dependency

    m = mujoco.MjModel.from_xml_string(xml)
    return system_from_mjmodel(m, **overrides)


def system_from_mjmodel(m, **overrides) -> System:
    import mujoco

    jtype_map = {
        int(mujoco.mjtJoint.mjJNT_FREE): FREE,
        int(mujoco.mjtJoint.mjJNT_SLIDE): SLIDE,
        int(mujoco.mjtJoint.mjJNT_HINGE): HINGE,
    }
    jnt_type = []
    for j in range(m.njnt):
        t = int(m.jnt_type[j])
        if t not in jtype_map:
            raise NotImplementedError(f"joint type {t} unsupported")
        jnt_type.append(jtype_map[t])

    # collision geoms: keep spheres/capsules on non-world bodies; the plane
    # is implicit (world z=0) — validate any plane present is exactly that.
    geom_rows = []
    for g in range(m.ngeom):
        gt = int(m.geom_type[g])
        b = int(m.geom_bodyid[g])
        if gt == int(mujoco.mjtGeom.mjGEOM_PLANE):
            continue
        if b == 0:
            continue
        if gt == int(mujoco.mjtGeom.mjGEOM_SPHERE):
            mine = GEOM_SPHERE
        elif gt == int(mujoco.mjtGeom.mjGEOM_CAPSULE):
            mine = GEOM_CAPSULE
        else:
            # boxes etc.: approximate by a sphere of the smallest half-size
            mine = GEOM_SPHERE
        geom_rows.append(
            (
                b,
                mine,
                np.array(m.geom_size[g]),
                np.array(m.geom_pos[g]),
                np.array(m.geom_quat[g]),
                float(m.geom_friction[g, 0]),
            )
        )

    if geom_rows:
        geom_body = np.array([r[0] for r in geom_rows], int)
        geom_type = np.array([r[1] for r in geom_rows], int)
        geom_size = np.stack([r[2] for r in geom_rows])
        geom_pos = np.stack([r[3] for r in geom_rows])
        geom_quat = np.stack([r[4] for r in geom_rows])
        geom_friction = np.array([r[5] for r in geom_rows])
    else:
        geom_body = np.zeros((0,), int)
        geom_type = np.zeros((0,), int)
        geom_size = np.zeros((0, 3))
        geom_pos = np.zeros((0, 3))
        geom_quat = np.zeros((0, 4))
        geom_friction = np.zeros((0,))

    # actuators: joint-torque motors only
    act_joint, act_gear, act_ctrlrange = [], [], []
    for a in range(m.nu):
        act_joint.append(int(m.actuator_trnid[a, 0]))
        act_gear.append(float(m.actuator_gear[a, 0]))
        if m.actuator_ctrllimited[a]:
            act_ctrlrange.append(np.array(m.actuator_ctrlrange[a]))
        else:
            act_ctrlrange.append(np.array([-1.0, 1.0]))

    kwargs = dict(
        body_parent=np.array(m.body_parentid, int),
        body_pos=np.array(m.body_pos),
        body_quat=np.array(m.body_quat),
        body_mass=np.array(m.body_mass),
        body_inertia=np.array(m.body_inertia),
        body_ipos=np.array(m.body_ipos),
        body_iquat=np.array(m.body_iquat),
        jnt_body=np.array(m.jnt_bodyid, int),
        jnt_type=np.array(jnt_type, int),
        jnt_axis=np.array(m.jnt_axis),
        jnt_pos=np.array(m.jnt_pos),
        jnt_qposadr=np.array(m.jnt_qposadr, int),
        jnt_dofadr=np.array(m.jnt_dofadr, int),
        jnt_range=np.array(m.jnt_range),
        jnt_limited=np.array(m.jnt_limited, bool),
        jnt_stiffness=np.array(m.jnt_stiffness),
        qpos0=np.array(m.qpos0),
        qpos_spring=np.array(m.qpos_spring),
        dof_damping=np.array(m.dof_damping),
        dof_armature=np.array(m.dof_armature),
        act_joint=np.array(act_joint, int),
        act_gear=np.array(act_gear),
        act_ctrlrange=(
            np.stack(act_ctrlrange) if act_ctrlrange else np.zeros((0, 2))
        ),
        geom_body=geom_body,
        geom_type=geom_type,
        geom_size=geom_size,
        geom_pos=geom_pos,
        geom_quat=geom_quat,
        geom_friction=geom_friction,
        dt=float(m.opt.timestep),
        gravity=np.array(m.opt.gravity),
    )
    kwargs.update(overrides)
    return System(**kwargs)
