"""Pallas TPU kernel: fused forward kinematics + velocity/bias propagation.

Why (SURVEY.md §7 hot-part #5): the FK tree walk is ~50 data-dependent small
ops per body chain; XLA lowers it to dozens of kernels whose fixed overhead
dominated the physics substep (~1 ms of a 2.7 ms substep at 4096 envs).
Here the ENTIRE walk of ``kinematics.forward_velocities`` — frames, dof
axes/anchors, body angular/linear velocities and the zero-q̈ bias
accelerations — runs in ONE kernel per env block, all intermediates in
vector registers / VMEM.

Layout: env axis on lanes (BLOCK_E envs per grid program). Every 3-vector / quaternion is a
python TUPLE of (E,) lane-vectors — no stacking, no reshapes inside the
kernel; every system constant is an immediate. The unroll is generated from
the static System at trace time, so each System gets its own specialized
kernel (cached by the dispatcher in physics/rigid/dynamics.py).

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
                    for d in range(3):
                        axis_o[dadr + i, d] = eye[i][d]
                        anchor_o[dadr + i, d] = zero
                for i in range(3):
                    col = _qrot(q, eye[i])
                    for d in range(3):
                        axis_o[dadr + 3 + i, d] = col[d]
                        anchor_o[dadr + 3 + i, d] = x[d]
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
                for d in range(3):
                    axis_o[dadr, d] = a_w[d]
                    anchor_o[dadr, d] = x[d]
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
                for d in range(3):
                    axis_o[dadr, d] = a_w[d]
                    anchor_o[dadr, d] = o_w[d]
        pos[b], quat[b] = x, q
        w[b], vx[b], al[b], ax[b] = om, v, alp, a

    for b in range(nb):
        rc = _qrot(quat[b], _const_vec(sys.body_ipos[b], zero))
        com = _add(pos[b], rc)
        vcom = _add(vx[b], _cross(w[b], rc))
        acom = _add(
            _add(ax[b], _cross(al[b], rc)),
            _cross(w[b], _cross(w[b], rc)),
        )
        for d in range(3):
            pos_o[b, d] = pos[b][d]
            com_o[b, d] = com[d]
            omega_o[b, d] = w[b][d]
            vcom_o[b, d] = vcom[d]
            alpha_o[b, d] = al[b][d]
            acom_o[b, d] = acom[d]
        for d in range(4):
            quat_o[b, d] = quat[b][d]


@functools.partial(jax.jit, static_argnames=("sys", "interpret"))
def fk_vel_pallas(sys: System, qpos, qvel, interpret: bool = False):
    """Batched fused FK: qpos (E,nq), qvel (E,nv) → dict of (E,·,3/4) arrays."""
    e = qpos.shape[0]
    pad = (-e) % BLOCK_E
    if pad:
        filler = jnp.tile(jnp.asarray(sys.default_qpos())[None], (pad, 1))
        qpos = jnp.concatenate([qpos, filler.astype(qpos.dtype)], axis=0)
        qvel = jnp.pad(qvel, ((0, pad), (0, 0)))
    ep = qpos.shape[0]
    qpos_t = qpos.T  # (nq, E)
    qvel_t = qvel.T

    layout, total_rows = _row_layout(sys)
    grid = (ep // BLOCK_E,)

    merged = pl.pallas_call(
        functools.partial(_fk_kernel_merged, sys),
        out_shape=jax.ShapeDtypeStruct((total_rows, ep), qpos.dtype),
        grid=grid,
        in_specs=[
            pl.BlockSpec(
                (sys.nq, BLOCK_E), lambda i: (0, i), memory_space=pltpu.VMEM
            ),
            pl.BlockSpec(
                (sys.nv, BLOCK_E), lambda i: (0, i), memory_space=pltpu.VMEM
            ),
        ],
        out_specs=pl.BlockSpec(
            (total_rows, BLOCK_E), lambda i: (0, i), memory_space=pltpu.VMEM
        ),
        interpret=interpret,
    )(qpos_t, qvel_t)

    # ONE transpose back to env-major, then static slicing per field
    flat = merged.T[:e]  # (E, total_rows)
    return {
        name: flat[:, off: off + rows * comps].reshape(e, rows, comps)
        for name, (off, rows, comps) in layout.items()
    }
