"""Quaternion / rotation helpers for the rigid-body pipeline.

Conventions: quaternions are (w, x, y, z), normalized, representing rotation
of vectors from the local frame into the parent/world frame. Angular
velocities are WORLD-frame throughout the engine (free-joint qvel rotational
part included) — chosen so every DOF reduces to a world-axis hinge/slide
column in the Jacobian assembly (see kinematics.py).
"""
from __future__ import annotations

import jax.numpy as jnp

from cadm_tpu.core.types import Array


def quat_mul(a: Array, b: Array) -> Array:
    aw, ax, ay, az = a[..., 0], a[..., 1], a[..., 2], a[..., 3]
    bw, bx, by, bz = b[..., 0], b[..., 1], b[..., 2], b[..., 3]
    return jnp.stack(
        [
            aw * bw - ax * bx - ay * by - az * bz,
            aw * bx + ax * bw + ay * bz - az * by,
            aw * by - ax * bz + ay * bw + az * bx,
            aw * bz + ax * by - ay * bx + az * bw,
        ],
        axis=-1,
    )


def quat_rotate(q: Array, v: Array) -> Array:
    """Rotate vector v by quaternion q (local → world)."""
    w = q[..., :1]
    u = q[..., 1:]
    return (
        v * (w * w - jnp.sum(u * u, axis=-1, keepdims=True))
        + 2.0 * u * jnp.sum(u * v, axis=-1, keepdims=True)
        + 2.0 * w * jnp.cross(u, v)
    )


def quat_to_mat(q: Array) -> Array:
    """3x3 rotation matrix from quaternion."""
    w, x, y, z = q[..., 0], q[..., 1], q[..., 2], q[..., 3]
    r = jnp.stack(
        [
            1 - 2 * (y * y + z * z), 2 * (x * y - w * z), 2 * (x * z + w * y),
            2 * (x * y + w * z), 1 - 2 * (x * x + z * z), 2 * (y * z - w * x),
            2 * (x * z - w * y), 2 * (y * z + w * x), 1 - 2 * (x * x + y * y),
        ],
        axis=-1,
    )
    return r.reshape(*q.shape[:-1], 3, 3)


def quat_from_axis_angle(axis: Array, angle: Array) -> Array:
    half = 0.5 * angle
    return jnp.concatenate(
        [jnp.cos(half)[..., None], axis * jnp.sin(half)[..., None]], axis=-1
    )


def quat_integrate(q: Array, omega_world: Array, dt: Array) -> Array:
    """q' = exp(ω_world·dt/2) ∘ q, renormalized (world-frame ω convention)."""
    angle = jnp.linalg.norm(omega_world, axis=-1, keepdims=True)
    # stable small-angle axis
    axis = omega_world / jnp.maximum(angle, 1e-9)
    dq = quat_from_axis_angle(axis, (angle * dt)[..., 0])
    out = quat_mul(dq, q)
    return out / jnp.linalg.norm(out, axis=-1, keepdims=True)


def quat_deriv(q: Array, omega_world: Array) -> Array:
    """q̇ = ½ (0, ω_world) ∘ q — world-frame angular-velocity kinematics."""
    zero = jnp.zeros_like(omega_world[..., :1])
    omega_q = jnp.concatenate([zero, omega_world], axis=-1)
    return 0.5 * quat_mul(omega_q, q)


def quat_integrate_local(q: Array, omega_local: Array, dt: Array) -> Array:
    """q' = q ∘ exp(ω_local·dt/2) — BODY-frame ω (MuJoCo free-joint dofs)."""
    angle = jnp.linalg.norm(omega_local, axis=-1, keepdims=True)
    axis = omega_local / jnp.maximum(angle, 1e-9)
    dq = quat_from_axis_angle(axis, (angle * dt)[..., 0])
    out = quat_mul(q, dq)
    return out / jnp.linalg.norm(out, axis=-1, keepdims=True)


def quat_deriv_local(q: Array, omega_local: Array) -> Array:
    """q̇ = ½ q ∘ (0, ω_local) — BODY-frame angular-velocity kinematics."""
    zero = jnp.zeros_like(omega_local[..., :1])
    omega_q = jnp.concatenate([zero, omega_local], axis=-1)
    return 0.5 * quat_mul(q, omega_q)
