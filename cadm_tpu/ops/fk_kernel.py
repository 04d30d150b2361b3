"""Pallas TPU kernel: fused forward kinematics + velocity/bias propagation.

Why (SURVEY.md §7 hot-part #5): the FK tree walk is ~50 data-dependent small
ops per body chain; XLA lowers it to dozens of kernels whose fixed overhead
dominated the physics substep (~1 ms of a 2.7 ms substep at 4096 envs).
Here the ENTIRE walk of ``kinematics.forward_velocities`` — frames, dof
axes/anchors, body angular/linear velocities and the zero-q̈ bias
accelerations — runs in ONE kernel per env block, all intermediates in
vector registers / VMEM.

Layout: env axis split over SUBLANES × LANES (BLOCK_E envs per grid program,
held as (8, BLOCK_E/8) tiles). Every 3-vector / quaternion is a python TUPLE
of (8, E/8)-shaped values — no stacking, no reshapes inside the kernel;
every system constant is an immediate. A flat (E,) layout would put the env
axis on lanes only (TPU rank-1 arrays occupy a single sublane), capping the
VPU at 1/8 utilization for every one of the ~10^4 unrolled ops; the 2-D env
split keeps each value a whole number of FULL (8,128) vregs. The unroll is
generated from the static System at trace time, so each System gets its own
specialized kernel (cached by the dispatcher in physics/rigid/dynamics.py).

Outputs feed the XLA-side einsums (mass matrix, bias projection, contacts):
  pos, com, omega, v_com, alpha0, a_com0 : (nb, 3, E)
  quat                                   : (nb, 4, E)
  dof_axis, dof_anchor                   : (nv, 3, E)
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from cadm_tpu.physics.rigid.system import FREE, HINGE, SLIDE, System

# Large env blocks amortize per-grid-step overhead; VMEM per block stays ~2MB.
BLOCK_E = 2048


# ---- tuple-vector helpers (components are (E,) lane vectors) --------------
def _cross(a, b):
    return (
        a[1] * b[2] - a[2] * b[1],
        a[2] * b[0] - a[0] * b[2],
        a[0] * b[1] - a[1] * b[0],
    )


def _add(a, b):
    return tuple(x + y for x, y in zip(a, b))


def _sub(a, b):
    return tuple(x - y for x, y in zip(a, b))


def _scale(a, s):
    return tuple(x * s for x in a)


def _qmul(p, q):
    pw, px, py, pz = p
    qw, qx, qy, qz = q
    return (
        pw * qw - px * qx - py * qy - pz * qz,
        pw * qx + px * qw + py * qz - pz * qy,
        pw * qy - px * qz + py * qw + pz * qx,
        pw * qz + px * qy - py * qx + pz * qw,
    )


def _qrot(q, v):
    """Rotate tuple-vector v by tuple-quaternion q (local → world)."""
    w = q[0]
    u = (q[1], q[2], q[3])
    uv = u[0] * v[0] + u[1] * v[1] + u[2] * v[2]
    uu = u[0] * u[0] + u[1] * u[1] + u[2] * u[2]
    c = _cross(u, v)
    return tuple(
        v[i] * (w * w - uu) + 2.0 * u[i] * uv + 2.0 * w * c[i]
        for i in range(3)
    )


def _const_vec(v, like):
    return tuple(jnp.full_like(like, float(x)) for x in v)


def _row_layout(sys: System):
    """Static row offsets of each output field in the merged (R, E) buffer."""
    nb, nv = sys.nb, sys.nv
    fields = [
        ("pos", nb, 3), ("quat", nb, 4), ("com", nb, 3), ("omega", nb, 3),
        ("v_com", nb, 3), ("alpha0", nb, 3), ("a_com0", nb, 3),
        ("dof_axis", nv, 3), ("dof_anchor", nv, 3),
    ]
    off, layout = 0, {}
    for name, rows, comps in fields:
        layout[name] = (off, rows, comps)
        off += rows * comps
    return layout, off


class _FieldView:
    """Write adapter: field[row, comp] = value maps to merged-buffer rows."""

    def __init__(self, out_ref, base):
        self.out_ref = out_ref
        self.base = base

    def __setitem__(self, idx, value):
        row, comp = idx
        self.out_ref[self.base[0] + row * self.base[2] + comp] = value


def _fk_kernel_merged(sys: System, qpos_ref, qvel_ref, out_ref):
    layout, _ = _row_layout(sys)
    views = {name: _FieldView(out_ref, layout[name]) for name in layout}
    _fk_kernel(
        sys, qpos_ref, qvel_ref,
        views["pos"], views["quat"], views["com"], views["omega"],
        views["v_com"], views["alpha0"], views["a_com0"],
        views["dof_axis"], views["dof_anchor"],
    )


def _fk_kernel(sys: System, qpos_ref, qvel_ref, pos_o, quat_o, com_o,
               omega_o, vcom_o, alpha_o, acom_o, axis_o, anchor_o):
    nb = sys.nb
    ones = qpos_ref[0] * 0.0 + 1.0  # (E,) template
    zero = ones * 0.0
    z3 = (zero, zero, zero)
    unit_q = (ones, zero, zero, zero)

    pos = [z3] * nb
    quat = [unit_q] * nb
    w = [z3] * nb
    vx = [z3] * nb
    al = [z3] * nb
    ax = [z3] * nb
    axis_t = [z3] * sys.nv
    anchor_t = [z3] * sys.nv

    for b in range(1, nb):
        p = int(sys.body_parent[b])
        q = _qmul(quat[p], _const_vec(sys.body_quat[b], zero))
        off = _qrot(quat[p], _const_vec(sys.body_pos[b], zero))
        x = _add(pos[p], off)
        om, alp = w[p], al[p]
        v = _add(vx[p], _cross(om, off))
        a = _add(
            _add(ax[p], _cross(alp, off)), _cross(om, _cross(om, off))
        )

        for j in np.nonzero(sys.jnt_body == b)[0]:
            jt = int(sys.jnt_type[j])
            qadr = int(sys.jnt_qposadr[j])
            dadr = int(sys.jnt_dofadr[j])
            if jt == FREE:
                x = tuple(qpos_ref[qadr + i] for i in range(3))
                qr = tuple(qpos_ref[qadr + 3 + i] for i in range(4))
                qn = jax.lax.rsqrt(
                    qr[0] * qr[0] + qr[1] * qr[1] + qr[2] * qr[2] + qr[3] * qr[3]
                )
                q = tuple(c * qn for c in qr)
                v = tuple(qvel_ref[dadr + i] for i in range(3))
                om_b = tuple(qvel_ref[dadr + 3 + i] for i in range(3))
                om = _qrot(q, om_b)
                alp = z3
                a = z3
                eye = ((ones, zero, zero), (zero, ones, zero), (zero, zero, ones))
                for i in range(3):
                    axis_t[dadr + i] = eye[i]
                    anchor_t[dadr + i] = z3
                for i in range(3):
                    axis_t[dadr + 3 + i] = _qrot(q, eye[i])
                    anchor_t[dadr + 3 + i] = x
            elif jt == SLIDE:
                a_w = _qrot(q, _const_vec(sys.jnt_axis[j], zero))
                s = qpos_ref[qadr] - float(sys.qpos0[qadr])
                sd = qvel_ref[dadr]
                x = _add(x, _scale(a_w, s))
                wxa = _cross(om, a_w)
                v = _add(v, _add(_scale(wxa, s), _scale(a_w, sd)))
                a = _add(
                    a,
                    _add(
                        _add(
                            _scale(_cross(alp, a_w), s),
                            _scale(_cross(om, wxa), s),
                        ),
                        _scale(wxa, 2.0 * sd),
                    ),
                )
                axis_t[dadr] = a_w
                anchor_t[dadr] = x
            elif jt == HINGE:
                a_w = _qrot(q, _const_vec(sys.jnt_axis[j], zero))
                o_w = _add(x, _qrot(q, _const_vec(sys.jnt_pos[j], zero)))
                th = qpos_ref[qadr] - float(sys.qpos0[qadr])
                thd = qvel_ref[dadr]
                half = 0.5 * th
                ch, sh = jnp.cos(half), jnp.sin(half)
                dq = (ch, a_w[0] * sh, a_w[1] * sh, a_w[2] * sh)
                q = _qmul(dq, q)
                rel_o = _sub(o_w, x)
                v_o = _add(v, _cross(om, rel_o))
                a_o = _add(
                    _add(a, _cross(alp, rel_o)),
                    _cross(om, _cross(om, rel_o)),
                )
                x = _add(o_w, _qrot(dq, _sub(x, o_w)))
                om_new = _add(om, _scale(a_w, thd))
                alp_new = _add(alp, _scale(_cross(om, a_w), thd))
                rel_n = _sub(x, o_w)
                v = _add(v_o, _cross(om_new, rel_n))
                a = _add(
                    _add(a_o, _cross(alp_new, rel_n)),
                    _cross(om_new, _cross(om_new, rel_n)),
                )
                om, alp = om_new, alp_new
                axis_t[dadr] = a_w
                anchor_t[dadr] = o_w
        pos[b], quat[b] = x, q
        w[b], vx[b], al[b], ax[b] = om, v, alp, a

    coms, vcoms, acoms = [], [], []
    for b in range(nb):
        rc = _qrot(quat[b], _const_vec(sys.body_ipos[b], zero))
        com = _add(pos[b], rc)
        vcom = _add(vx[b], _cross(w[b], rc))
        acom = _add(
            _add(ax[b], _cross(al[b], rc)),
            _cross(w[b], _cross(w[b], rc)),
        )
        coms.append(com)
        vcoms.append(vcom)
        acoms.append(acom)
        for d in range(3):
            pos_o[b, d] = pos[b][d]
            com_o[b, d] = com[d]
            omega_o[b, d] = w[b][d]
            vcom_o[b, d] = vcom[d]
            alpha_o[b, d] = al[b][d]
            acom_o[b, d] = acom[d]
        for d in range(4):
            quat_o[b, d] = quat[b][d]
    for v in range(sys.nv):
        for d in range(3):
            axis_o[v, d] = axis_t[v][d]
            anchor_o[v, d] = anchor_t[v][d]
    # internal structures for the fused full-dynamics kernel
    return dict(
        pos=pos, quat=quat, omega=w, alpha=al, com=coms, vcom=vcoms,
        acom=acoms, axis=axis_t, anchor=anchor_t,
    )


def _env_split(x_t, ep):
    """(rows, E) → (rows, 8, E/8): env axis over sublanes × lanes."""
    return x_t.reshape(x_t.shape[0], 8, ep // 8)


@functools.partial(jax.jit, static_argnames=("sys", "interpret", "block"))
def fk_vel_pallas(
    sys: System, qpos, qvel, interpret: bool = False, block: int = BLOCK_E
):
    """Batched fused FK: qpos (E,nq), qvel (E,nv) → dict of (E,·,3/4) arrays."""
    assert block % 8 == 0, "env block must cover whole (8, lanes) tiles"
    e = qpos.shape[0]
    pad = (-e) % block
    if pad:
        filler = jnp.tile(jnp.asarray(sys.default_qpos())[None], (pad, 1))
        qpos = jnp.concatenate([qpos, filler.astype(qpos.dtype)], axis=0)
        qvel = jnp.pad(qvel, ((0, pad), (0, 0)))
    ep = qpos.shape[0]
    lb = block // 8  # lane extent per grid program

    layout, total_rows = _row_layout(sys)
    grid = (ep // block,)

    merged = pl.pallas_call(
        functools.partial(_fk_kernel_merged, sys),
        out_shape=jax.ShapeDtypeStruct((total_rows, 8, ep // 8), qpos.dtype),
        grid=grid,
        in_specs=[
            pl.BlockSpec(
                (sys.nq, 8, lb), lambda i: (0, 0, i), memory_space=pltpu.VMEM
            ),
            pl.BlockSpec(
                (sys.nv, 8, lb), lambda i: (0, 0, i), memory_space=pltpu.VMEM
            ),
        ],
        out_specs=pl.BlockSpec(
            (total_rows, 8, lb), lambda i: (0, 0, i), memory_space=pltpu.VMEM
        ),
        interpret=interpret,
    )(_env_split(qpos.T, ep), _env_split(qvel.T, ep))

    # ONE transpose back to env-major, then static slicing per field
    flat = merged.reshape(total_rows, ep).T[:e]  # (E, total_rows)
    return {
        name: flat[:, off: off + rows * comps].reshape(e, rows, comps)
        for name, (off, rows, comps) in layout.items()
    }


# ===== full smooth-dynamics kernel ==========================================
# Extends the FK walk with everything up to the pre-contact velocity:
# world inertias, joint-space mass matrix (tree-sparse assembly), bias
# projection, actuation + passive forces, implicit-damping system matrix,
# unrolled Cholesky inverse, and v_pred = qvel + dt·M⁻¹τ — one kernel, zero
# HBM round-trips between those stages. Only the contact stage (Delassus
# matmuls + the PGS kernel) stays outside. Systems with large nv (humanoid)
# fall back to the composed path — see physics/rigid/dynamics.py dispatch.

FULL_DYN_MAX_NV = 24  # humanoid (nv=23) compiles in ~60s and matches the composed path


def _row_layout_full(sys: System):
    layout, off = _row_layout(sys)
    nv = sys.nv
    layout = dict(layout)
    layout["minv"] = (off, nv, nv)
    off += nv * nv
    layout["v_pred"] = (off, nv, 1)
    off += nv
    return layout, off


def _quat_to_R(q):
    """3x3 rotation entries (tuple-of-tuples) from tuple quaternion."""
    w, x, y, z = q
    return (
        (1 - 2 * (y * y + z * z), 2 * (x * y - w * z), 2 * (x * z + w * y)),
        (2 * (x * y + w * z), 1 - 2 * (x * x + z * z), 2 * (y * z - w * x)),
        (2 * (x * z - w * y), 2 * (y * z + w * x), 1 - 2 * (x * x + y * y)),
    )


def _full_dyn_kernel(sys: System, qpos_ref, qvel_ref, ctrl_ref, par_ref, out_ref):
    from cadm_tpu.physics.rigid.system import HINGE as _H, SLIDE as _S

    layout, _ = _row_layout_full(sys)
    views = {name: _FieldView(out_ref, layout[name]) for name in layout}
    st = _fk_kernel(
        sys, qpos_ref, qvel_ref,
        views["pos"], views["quat"], views["com"], views["omega"],
        views["v_com"], views["alpha0"], views["a_com0"],
        views["dof_axis"], views["dof_anchor"],
    )

    nb, nv, nu = sys.nb, sys.nv, sys.nu
    zero = qpos_ref[0] * 0.0
    mass_scale = par_ref[0]
    damping_scale = par_ref[1]

    mask = sys.ancestry_mask()                      # (nb, nv) static bool
    is_rot = np.zeros((nv,), bool)
    for j in range(sys.nj):
        jt = int(sys.jnt_type[j])
        d0 = int(sys.jnt_dofadr[j])
        if jt == FREE:
            is_rot[d0 + 3: d0 + 6] = True
        elif jt == _H:
            is_rot[d0] = True

    def dot3(a, b):
        return a[0] * b[0] + a[1] * b[1] + a[2] * b[2]

    g = tuple(float(x) for x in sys.gravity)

    # per-body world inertia (×mass_scale), bias force & torque
    f_b, t_b, Iw_b = [], [], []
    for b in range(nb):
        # inertial-frame orientation: body quat composed with static iquat
        q_i = _qmul(st["quat"][b], _const_vec(sys.body_iquat[b], zero))
        R = _quat_to_R(q_i)
        Idiag = [float(x) for x in sys.body_inertia[b]]
        Iw = [[None] * 3 for _ in range(3)]
        for i in range(3):
            for jj in range(i, 3):
                Iw[i][jj] = (
                    R[i][0] * Idiag[0] * R[jj][0]
                    + R[i][1] * Idiag[1] * R[jj][1]
                    + R[i][2] * Idiag[2] * R[jj][2]
                ) * mass_scale
                Iw[jj][i] = Iw[i][jj]
        Iw_b.append(Iw)
        m = float(sys.body_mass[b]) * mass_scale
        acom = st["acom"][b]
        f_b.append(tuple(m * (acom[i] - g[i]) for i in range(3)))
        om, alp = st["omega"][b], st["alpha"][b]

        def mat3(Iw, v):
            return tuple(
                Iw[i][0] * v[0] + Iw[i][1] * v[1] + Iw[i][2] * v[2]
                for i in range(3)
            )

        t_b.append(_add(mat3(Iw, alp), _cross(om, mat3(Iw, om))))

    # dof columns at body COMs (tree-sparse)
    desc = [list(np.nonzero(mask[:, d])[0]) for d in range(nv)]
    col = {}
    for d in range(nv):
        for b in desc[d]:
            if is_rot[d]:
                col[(d, b)] = _cross(
                    st["axis"][d], _sub(st["com"][b], st["anchor"][d])
                )
            else:
                col[(d, b)] = st["axis"][d]

    # bias projection c and generalized force tau
    tau = []
    for d in range(nv):
        c_d = zero
        for b in desc[d]:
            c_d = c_d + dot3(col[(d, b)], f_b[b])
            if is_rot[d]:
                c_d = c_d + dot3(st["axis"][d], t_b[b])
        B_d = float(sys.dof_damping[d]) * damping_scale
        tau.append(-c_d - B_d * qvel_ref[d])
    # actuation through gears (static dof map)
    for a in range(nu):
        dof = int(sys.jnt_dofadr[int(sys.act_joint[a])])
        lo, hi = float(sys.act_ctrlrange[a, 0]), float(sys.act_ctrlrange[a, 1])
        force = (
            jnp.clip(ctrl_ref[a], lo, hi)
            * float(sys.act_gear[a])
            * par_ref[2 + a]
        )
        tau[dof] = tau[dof] + force
    # passive springs + joint-limit penalties (1-dof joints)
    for j in range(sys.nj):
        jt = int(sys.jnt_type[j])
        if jt not in (_H, _S):
            continue
        qadr, dadr = int(sys.jnt_qposadr[j]), int(sys.jnt_dofadr[j])
        qj = qpos_ref[qadr]
        k_spring = float(sys.jnt_stiffness[j])
        if k_spring > 0.0:
            tau[dadr] = tau[dadr] - k_spring * (
                qj - float(sys.qpos_spring[qadr])
            )
        if bool(sys.jnt_limited[j]):
            lo, hi = float(sys.jnt_range[j, 0]), float(sys.jnt_range[j, 1])
            viol_hi = jnp.maximum(qj - hi, 0.0)
            viol_lo = jnp.maximum(lo - qj, 0.0)
            active = ((viol_hi > 0) | (viol_lo > 0)).astype(qj.dtype)
            tau[dadr] = (
                tau[dadr]
                - sys.limit_stiffness * (viol_hi - viol_lo)
                - sys.limit_damping * qvel_ref[dadr] * active
            )

    # mass matrix (tree-sparse entries; dense lower-triangular container)
    M = [[None] * nv for _ in range(nv)]
    for d in range(nv):
        for e in range(d, nv):
            common = [b for b in desc[e] if mask[b, d]]
            if not common and d != e:
                continue
            acc = zero
            for b in common:
                m = float(sys.body_mass[b]) * mass_scale
                acc = acc + m * dot3(col[(d, b)], col[(e, b)])
                if is_rot[d] and is_rot[e]:
                    Iw = Iw_b[b]
                    av = st["axis"][d]
                    bv = st["axis"][e]
                    acc = acc + dot3(
                        av,
                        (
                            Iw[0][0] * bv[0] + Iw[0][1] * bv[1] + Iw[0][2] * bv[2],
                            Iw[1][0] * bv[0] + Iw[1][1] * bv[1] + Iw[1][2] * bv[2],
                            Iw[2][0] * bv[0] + Iw[2][1] * bv[1] + Iw[2][2] * bv[2],
                        ),
                    )
            if d == e:
                acc = acc + float(sys.dof_armature[d]) + sys.dt * (
                    float(sys.dof_damping[d]) * damping_scale
                )
            M[d][e] = acc
            M[e][d] = acc

    def ent(i, jj):
        v = M[i][jj]
        return zero if v is None else v

    # unrolled dense Cholesky + inverse (nv is small and static)
    L = [[None] * nv for _ in range(nv)]
    for j in range(nv):
        s = ent(j, j)
        for k in range(j):
            s = s - L[j][k] * L[j][k]
        L[j][j] = jnp.sqrt(jnp.maximum(s, 1e-12))
        inv_jj = 1.0 / L[j][j]
        for i in range(j + 1, nv):
            s = ent(i, j)
            for k in range(j):
                s = s - L[i][k] * L[j][k]
            L[i][j] = s * inv_jj
    Linv = [[None] * nv for _ in range(nv)]
    for j in range(nv):
        Linv[j][j] = 1.0 / L[j][j]
        for i in range(j + 1, nv):
            s = zero
            for k in range(j, i):
                s = s - L[i][k] * Linv[k][j]
            Linv[i][j] = s / L[i][i]
    for a in range(nv):
        for b in range(a, nv):
            s = zero
            for k in range(b, nv):
                s = s + Linv[k][a] * Linv[k][b]
            views["minv"][a, b] = s
            if a != b:
                views["minv"][b, a] = s
    # v_pred = qvel + dt * Minv @ tau  (recompute Minv rows from Linv sums)
    for d in range(nv):
        acc = zero
        for e in range(nv):
            s = zero
            for k in range(max(d, e), nv):
                s = s + Linv[k][d] * Linv[k][e]
            acc = acc + s * tau[e]
        views["v_pred"][d, 0] = qvel_ref[d] + sys.dt * acc


@functools.partial(jax.jit, static_argnames=("sys", "interpret", "block"))
def full_dyn_pallas(
    sys: System, qpos, qvel, ctrl, mass_scale, damping_scale, act_mask,
    interpret: bool = False, block: int = BLOCK_E,
):
    """Batched fused smooth-dynamics step (everything but contacts).

    qpos (E,nq), qvel (E,nv), ctrl (E,nu), mass/damping scales (E,),
    act_mask (E,nu) → dict of FK fields + minv (E,nv,nv) + v_pred (E,nv).
    """
    assert block % 8 == 0, "env block must cover whole (8, lanes) tiles"
    e = qpos.shape[0]
    pad = (-e) % block
    if pad:
        filler = jnp.tile(jnp.asarray(sys.default_qpos())[None], (pad, 1))
        qpos = jnp.concatenate([qpos, filler.astype(qpos.dtype)], axis=0)
        qvel = jnp.pad(qvel, ((0, pad), (0, 0)))
        ctrl = jnp.pad(ctrl, ((0, pad), (0, 0)))
        mass_scale = jnp.pad(mass_scale, ((0, pad),), constant_values=1.0)
        damping_scale = jnp.pad(damping_scale, ((0, pad),), constant_values=1.0)
        act_mask = jnp.pad(act_mask, ((0, pad), (0, 0)))
    ep = qpos.shape[0]
    lb = block // 8
    par = jnp.concatenate(
        [mass_scale[:, None], damping_scale[:, None], act_mask], axis=1
    ).T  # (2+nu, E)

    layout, total_rows = _row_layout_full(sys)
    grid = (ep // block,)
    merged = pl.pallas_call(
        functools.partial(_full_dyn_kernel, sys),
        out_shape=jax.ShapeDtypeStruct((total_rows, 8, ep // 8), qpos.dtype),
        grid=grid,
        in_specs=[
            pl.BlockSpec(
                (sys.nq, 8, lb), lambda i: (0, 0, i), memory_space=pltpu.VMEM
            ),
            pl.BlockSpec(
                (sys.nv, 8, lb), lambda i: (0, 0, i), memory_space=pltpu.VMEM
            ),
            pl.BlockSpec(
                (sys.nu, 8, lb), lambda i: (0, 0, i), memory_space=pltpu.VMEM
            ),
            pl.BlockSpec(
                (2 + sys.nu, 8, lb),
                lambda i: (0, 0, i),
                memory_space=pltpu.VMEM,
            ),
        ],
        out_specs=pl.BlockSpec(
            (total_rows, 8, lb), lambda i: (0, 0, i), memory_space=pltpu.VMEM
        ),
        interpret=interpret,
    )(
        _env_split(qpos.T, ep), _env_split(qvel.T, ep),
        _env_split(ctrl.T, ep), _env_split(par, ep),
    )

    flat = merged.reshape(total_rows, ep).T[:e]
    return {
        name: flat[:, off: off + rows * comps].reshape(e, rows, comps)
        for name, (off, rows, comps) in layout.items()
    }
