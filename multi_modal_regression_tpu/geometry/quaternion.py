"""Batched quaternion operations in JAX (scalar-first (w, x, y, z) convention).

Conventions follow the reference (quaternion.py) so metric parity holds:
  - q = (cos(theta/2), sin(theta/2) * axis); when the rotation's skew-part norm
    is <= eps the angle is treated as 0 and q = (1, 0, 0, 0)
    (reference: quaternion.py:18-29).
  - geodesic angle between unit quaternions: 2*arccos(|<q1, q2>|)
    (double cover — q and -q are the same rotation; quaternion.py:33-51).
  - axis-angle dictionary -> quaternion dictionary renormalizes each atom
    (quaternion.py:79-92).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from multi_modal_regression_tpu import EPS


def quat_from_axis_angle(v: jax.Array, eps: float = EPS) -> jax.Array:
    """Axis-angle vectors (..., 3) -> unit quaternions (..., 4)."""
    sq = jnp.sum(v * v, axis=-1, keepdims=True)
    angle = jnp.sqrt(jnp.maximum(sq, 0.0))
    norm = jnp.sqrt(jnp.maximum(sq, eps * eps))
    small = angle <= eps
    axis = jnp.where(small, jnp.zeros_like(v), v / norm)
    half = 0.5 * angle[..., 0]
    w = jnp.cos(half)
    xyz = jnp.sin(half)[..., None] * axis
    return jnp.concatenate([w[..., None], xyz], axis=-1)


def quat_from_rotation(R: jax.Array, eps: float = EPS) -> jax.Array:
    """Rotation matrices (..., 3, 3) -> unit quaternions (..., 4).

    Matches the reference's axis-from-skew-part construction: theta from the
    trace; when the skew norm <= eps the result is the identity quaternion
    (quaternion.py:18-29 sets theta = 0 in that branch).
    """
    tr = jnp.trace(R, axis1=-2, axis2=-1)
    skew = 0.5 * (R - jnp.swapaxes(R, -2, -1))
    v = jnp.stack([skew[..., 2, 1], skew[..., 0, 2], skew[..., 1, 0]], axis=-1)
    # atan2(|skew|, (tr-1)/2) == arccos-of-trace but float32-stable (see so3.log_so3)
    theta = jnp.arctan2(
        jnp.sqrt(jnp.maximum(jnp.sum(v * v, axis=-1), 0.0)), 0.5 * (tr - 1.0)
    )
    sq = jnp.sum(v * v, axis=-1, keepdims=True)
    norm = jnp.sqrt(jnp.maximum(sq, eps * eps))
    small = jnp.sqrt(jnp.maximum(sq, 0.0))[..., 0] <= eps
    axis = jnp.where(small[..., None], jnp.zeros_like(v), v / norm)
    theta = jnp.where(small, jnp.zeros_like(theta), theta)
    half = 0.5 * theta
    w = jnp.cos(half)
    xyz = jnp.sin(half)[..., None] * axis
    return jnp.concatenate([w[..., None], xyz], axis=-1)


def axis_angle_from_quat(q: jax.Array, eps: float = EPS) -> jax.Array:
    """Unit quaternions (..., 4) -> axis-angle vectors (..., 3)."""
    w = jnp.clip(q[..., 0], -1.0, 1.0)
    theta = 2.0 * jnp.arccos(w)
    xyz = q[..., 1:]
    sq = jnp.sum(xyz * xyz, axis=-1, keepdims=True)
    norm = jnp.sqrt(jnp.maximum(sq, eps * eps))
    small = jnp.sqrt(jnp.maximum(sq, 0.0)) <= eps
    axis = jnp.where(small, jnp.zeros_like(xyz), xyz / norm)
    return theta[..., None] * axis


def quat_geodesic_angle(q1: jax.Array, q2: jax.Array, eps: float | None = None) -> jax.Array:
    """Angle (radians) between rotations represented by unit quaternions.

    2*arccos(|<q1, q2>|), clipped to [-1, 1] (metric convention) or to
    +/-(1-eps) when eps is given (loss convention).
    """
    dot = jnp.sum(q1 * q2, axis=-1)
    if eps is None:
        dot = jnp.clip(dot, -1.0, 1.0)
    adot = jnp.abs(dot)
    if eps is not None:
        adot = jnp.clip(adot, -1.0 + eps, 1.0 - eps)
    return 2.0 * jnp.arccos(adot)


def convert_dictionary(axis_angle_dict: jax.Array, eps: float = EPS) -> jax.Array:
    """Axis-angle dictionary (K, 3) -> renormalized quaternion dictionary (K, 4)."""
    q = quat_from_axis_angle(axis_angle_dict, eps=eps)
    return q / jnp.linalg.norm(q, axis=-1, keepdims=True)
