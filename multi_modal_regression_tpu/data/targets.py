"""On-device bin/residual target transforms (pure JAX).

The reference computes training targets per item on host CPU with sklearn
(kmeans.predict / gmm.predict_proba / cdist) and numpy Rodrigues loops
(binDeltaGenerators.py:10-139, dataGenerators.py:135-178). Here every target
is a pure function of the euler-angle batch and the dictionary arrays, traced
into the SAME compiled train step — no host pre-processing in the hot loop:

  euler_to_pose            euler (az, el, ct) -> axis-angle / quaternion
  hard_bin_targets         kmeans hard bin + Euclidean residual (GBDGenerator)
  gmm_soft_targets         GMM posterior soft bins + posterior-mean residual
                           (XPBDGenerator; posterior math = dictionary.gmm)
  rbf_soft_targets         exp(-gamma * d^2) normalized soft bins ('m3' /
                           XPBDGeneratorQ, gamma=10 default)
  tangent_residual_targets R-space targets: hard bin + log(R_bin^T R)
                           (RBDGenerator / get_residuals 'm2')
  per_bin_tangent_residuals  residual target per bin (dataGenerators.py:173-178)

All distances are one (B, K) matmul-style cdist on the MXU.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from multi_modal_regression_tpu.geometry.quaternion import quat_from_rotation
from multi_modal_regression_tpu.geometry.so3 import (
    exp_so3,
    log_so3,
    rotation_from_euler,
)


# single shared implementation (also used by dictionary learning and the
# Pallas fallback) — one place to fix distance numerics
from multi_modal_regression_tpu.dictionary.common import (  # noqa: E402
    pairwise_sqeuclidean,
)


def euler_to_pose(euler: jax.Array, ydata_type: str = "axis_angle") -> jax.Array:
    """Euler (B, 3) degrees -> pose targets: axis-angle (B, 3) or unit
    quaternion (B, 4). The tilt-sign convention (render -ct) is applied by
    the loader before this point."""
    R = rotation_from_euler(euler[:, 0], euler[:, 1], euler[:, 2])
    if ydata_type == "axis_angle":
        return log_so3(R)
    if ydata_type == "quaternion":
        return quat_from_rotation(R)
    raise ValueError(f"unknown ydata_type {ydata_type!r}")


def hard_bin_targets(
    y: jax.Array, centers: jax.Array
) -> tuple[jax.Array, jax.Array]:
    """kmeans.predict + Euclidean residual (binDeltaGenerators.py:27-31).

    y (B, D), centers (K, D) -> bins (B,) int32, residual (B, D).
    """
    bins = jnp.argmin(pairwise_sqeuclidean(y, centers), axis=-1)
    return bins.astype(jnp.int32), y - centers[bins]


def gmm_log_responsibilities(
    y: jax.Array, means: jax.Array, covariances: jax.Array, weights: jax.Array
) -> jax.Array:
    """log p(k | y) for a full-covariance GMM, batched over components."""
    d = means.shape[-1]
    chol = jnp.linalg.cholesky(covariances)  # (K, D, D)
    diff = y[:, None, :] - means[None, :, :]  # (B, K, D)

    def _maha_k(chol_k, diff_k):  # (D, D), (B, D) -> (B,)
        sol = jax.scipy.linalg.solve_triangular(chol_k, diff_k.T, lower=True)
        return jnp.sum(sol * sol, axis=0)

    maha = jax.vmap(_maha_k, in_axes=(0, 1), out_axes=1)(chol, diff)  # (B, K)
    logdet = jnp.sum(
        jnp.log(jnp.diagonal(chol, axis1=-2, axis2=-1)), axis=-1
    )  # (K,)
    log_prob = (
        -0.5 * (maha + d * jnp.log(2.0 * jnp.pi))
        - logdet[None, :]
        + jnp.log(weights)[None, :]
    )
    return log_prob - jax.scipy.special.logsumexp(log_prob, axis=-1, keepdims=True)


def gmm_soft_targets(
    y: jax.Array, means: jax.Array, covariances: jax.Array, weights: jax.Array
) -> tuple[jax.Array, jax.Array]:
    """GMM posterior soft bins + residual vs the posterior mean
    (XPBDGenerator, binDeltaGenerators.py:52-56)."""
    resp = jnp.exp(gmm_log_responsibilities(y, means, covariances, weights))
    return resp, y - resp @ means


def rbf_soft_targets(
    y: jax.Array, centers: jax.Array, gamma: float = 10.0
) -> tuple[jax.Array, jax.Array]:
    """Soft bins exp(-gamma * ||y - c||^2), normalized; residual vs the
    soft-weighted center (problem 'm3', dataGenerators.py:156-166 and
    XPBDGeneratorQ, binDeltaGenerators.py:104-108; the ablation's tunable
    gamma is ablationFunctions.py:146)."""
    d = pairwise_sqeuclidean(y, centers)
    # softmax over -gamma*d == normalized exp(-gamma*d), but stable
    soft = jax.nn.softmax(-gamma * d, axis=-1)
    return soft, y - soft @ centers


def tangent_residual_targets(
    y: jax.Array, centers: jax.Array, key_rotations: jax.Array
) -> tuple[jax.Array, jax.Array, jax.Array]:
    """Hard bin + SO(3) tangent residual at the assigned bin + R matrices.

    Returns (bins (B,), residual (B, 3) = log(R_bin^T R), R (B, 3, 3)) —
    the RBDGenerator targets (binDeltaGenerators.py:125-139), with the
    per-sample numpy Rodrigues loop replaced by batched exp/log maps.
    """
    bins = jnp.argmin(pairwise_sqeuclidean(y, centers), axis=-1)
    R = exp_so3(y)
    res = log_so3(jnp.swapaxes(key_rotations[bins], -2, -1) @ R)
    return bins.astype(jnp.int32), res, R


def per_bin_tangent_residuals(
    y: jax.Array, key_rotations: jax.Array
) -> jax.Array:
    """Residual target per bin: res[b, k] = log(R_k^T R_b) (B, K, 3)
    (get_residuals, dataGenerators.py:173-178 — double python loop there)."""
    R = exp_so3(y)  # (B, 3, 3)
    rel = jnp.swapaxes(key_rotations, -2, -1)[None] @ R[:, None]  # (B, K, 3, 3)
    return log_so3(rel)
