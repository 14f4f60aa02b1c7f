"""Batched SO(3) operations in JAX.

Everything here is a pure function over arrays with leading batch dimensions,
safe under jit/vmap/grad (no data-dependent Python control flow, NaN-safe
gradients at the identity via masked normalization).

Numeric conventions follow the reference implementation so that downstream
metrics agree bit-for-bit within fp tolerance:
  - Euler convention R = Rz(ct) @ Rx(el) @ Rz(az), angles in degrees
    (reference: helperFunctions.py:37-48, get_R.m:5-15).
  - log map: theta = arccos(clip(0.5*(tr(R)-1), -1, 1)); the axis comes from
    the skew part and is zeroed when its norm <= eps
    (reference: axisAngle.py:19-29, get_v.m:3-14).
  - exp map: Rodrigues formula, identity when |v| < eps
    (reference: axisAngle.py:33-41).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from multi_modal_regression_tpu import EPS


def hat(v: jax.Array) -> jax.Array:
    """Map axis vectors (..., 3) to skew-symmetric matrices (..., 3, 3).

    hat(v) @ x == cross(v, x).
    """
    z = jnp.zeros_like(v[..., 0])
    row0 = jnp.stack([z, -v[..., 2], v[..., 1]], axis=-1)
    row1 = jnp.stack([v[..., 2], z, -v[..., 0]], axis=-1)
    row2 = jnp.stack([-v[..., 1], v[..., 0], z], axis=-1)
    return jnp.stack([row0, row1, row2], axis=-2)


def _safe_normalize(v: jax.Array, eps: float) -> tuple[jax.Array, jax.Array]:
    """Return (v/|v|, |v|) with a zero vector (not NaN) when |v| <= eps.

    The gradient is also NaN-free at v = 0: the norm used in the division is
    clamped away from zero before dividing.
    """
    sq = jnp.sum(v * v, axis=-1, keepdims=True)
    norm = jnp.sqrt(jnp.maximum(sq, eps * eps))
    small = sq <= (eps * eps)
    unit = jnp.where(small, jnp.zeros_like(v), v / norm)
    return unit, jnp.sqrt(jnp.maximum(sq, 0.0))[..., 0]


def rotation_from_euler(az: jax.Array, el: jax.Array, ct: jax.Array) -> jax.Array:
    """Euler angles (degrees) -> rotation matrices (..., 3, 3).

    R = Rz(ct) @ Rx(el) @ Rz(az) — azimuth about Z, elevation about X,
    camera tilt about Z, matching the PASCAL3D+ viewpoint convention.
    """
    a = jnp.radians(az)
    b = jnp.radians(el)
    c = jnp.radians(ct)
    ca, sa = jnp.cos(a), jnp.sin(a)
    cb, sb = jnp.cos(b), jnp.sin(b)
    cc, sc = jnp.cos(c), jnp.sin(c)
    z = jnp.zeros_like(ca)
    one = jnp.ones_like(ca)
    Ra = jnp.stack([
        jnp.stack([ca, -sa, z], axis=-1),
        jnp.stack([sa, ca, z], axis=-1),
        jnp.stack([z, z, one], axis=-1),
    ], axis=-2)
    Rb = jnp.stack([
        jnp.stack([one, z, z], axis=-1),
        jnp.stack([z, cb, -sb], axis=-1),
        jnp.stack([z, sb, cb], axis=-1),
    ], axis=-2)
    Rc = jnp.stack([
        jnp.stack([cc, -sc, z], axis=-1),
        jnp.stack([sc, cc, z], axis=-1),
        jnp.stack([z, z, one], axis=-1),
    ], axis=-2)
    return Rc @ Rb @ Ra


def exp_so3(v: jax.Array, eps: float = EPS) -> jax.Array:
    """Axis-angle vectors (..., 3) -> rotation matrices (..., 3, 3) (Rodrigues).

    Returns the identity for |v| < eps.
    """
    unit, theta = _safe_normalize(v, eps)
    V = hat(unit)
    # For a unit axis u, V@V == u u^T - I, so Rodrigues becomes
    # R = cos(t) I + sin(t) V + (1-cos(t)) u u^T — pure elementwise ops
    # (no 3x3 matmul, which XLA would otherwise route through the MXU at
    # reduced precision for float32).
    outer = unit[..., :, None] * unit[..., None, :]
    sin_t = jnp.sin(theta)[..., None, None]
    cos_t = jnp.cos(theta)[..., None, None]
    eye = jnp.broadcast_to(jnp.eye(3, dtype=v.dtype), V.shape)
    R = cos_t * eye + sin_t * V + (1.0 - cos_t) * outer
    small = (theta < eps)[..., None, None]
    return jnp.where(small, eye, R)


def log_so3(R: jax.Array, eps: float = EPS) -> jax.Array:
    """Rotation matrices (..., 3, 3) -> axis-angle vectors (..., 3).

    theta via atan2(|skew|, (tr-1)/2) — equivalent to the reference's
    arccos-of-trace in exact arithmetic but well-conditioned in float32
    (arccos loses ~3 digits near the identity); axis from the skew part,
    zeroed when its norm is <= eps (theta near 0 or pi, where the reference
    returns the zero vector too).
    """
    tr = jnp.trace(R, axis1=-2, axis2=-1)
    tR = 0.5 * (tr - 1.0)
    skew = 0.5 * (R - jnp.swapaxes(R, -2, -1))
    sin_theta = jnp.sqrt(
        jnp.maximum(
            skew[..., 2, 1] ** 2 + skew[..., 0, 2] ** 2 + skew[..., 1, 0] ** 2, 0.0
        )
    )
    theta = jnp.arctan2(sin_theta, tR)
    v = jnp.stack(
        [skew[..., 2, 1], skew[..., 0, 2], skew[..., 1, 0]], axis=-1
    )
    sq = jnp.sum(v * v, axis=-1, keepdims=True)
    norm = jnp.sqrt(jnp.maximum(sq, eps * eps))
    # reference zeroes the axis when |v| <= eps (axisAngle.py:25-28)
    small = jnp.sqrt(jnp.maximum(sq, 0.0)) <= eps
    unit = jnp.where(small, jnp.zeros_like(v), v / norm)
    return theta[..., None] * unit


def geodesic_angle(R1: jax.Array, R2: jax.Array, eps: float | None = None) -> jax.Array:
    """Geodesic angle (radians) between rotation matrices, batched.

    arccos(clip(0.5*(tr(R1^T R2) - 1))). With eps=None the clip is to the
    closed interval [-1, 1] (metric convention, axisAngle.py:58); with an eps
    it is to +/-(1-eps) (loss convention for finite gradients).
    """
    # trace(R1^T R2) is the Frobenius inner product <R1, R2> — elementwise,
    # avoiding a low-precision 3x3 MXU matmul.
    tR = 0.5 * (jnp.sum(R1 * R2, axis=(-2, -1)) - 1.0)
    if eps is None:
        tR = jnp.clip(tR, -1.0, 1.0)
    else:
        tR = jnp.clip(tR, -1.0 + eps, 1.0 - eps)
    return jnp.abs(jnp.arccos(tR))


def geodesic_distance_aa(y1: jax.Array, y2: jax.Array, eps: float | None = None) -> jax.Array:
    """Geodesic angle (radians) between two axis-angle batches (..., 3)."""
    return geodesic_angle(exp_so3(y1), exp_so3(y2), eps=eps)
