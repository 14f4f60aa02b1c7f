"""Loss primitives with the reference's reduction conventions.

Reductions matter for parity: cross-entropy averages over the batch, MSE/L1
average over *all elements*, and KL divergence averages over all elements
(the torch nn.KLDivLoss() default the reference relies on — NOT batchmean).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from multi_modal_regression_tpu import EPS


def cross_entropy(logits: jax.Array, labels: jax.Array) -> jax.Array:
    """Softmax cross-entropy with integer labels, mean over batch."""
    logp = jax.nn.log_softmax(logits, axis=-1)
    nll = -jnp.take_along_axis(logp, labels[..., None], axis=-1)[..., 0]
    return jnp.mean(nll)


def kl_div_mean(log_pred: jax.Array, target: jax.Array) -> jax.Array:
    """KL(target || softmax) given log-probabilities, mean over ALL elements.

    Pointwise target * (log(target) - log_pred), with 0*log(0) := 0 —
    the torch nn.KLDivLoss(reduction='mean') convention used by every
    relaxed loss in the reference (binDeltaLosses.py:75-106).
    """
    pointwise = jnp.where(
        target > 0, target * (jnp.log(jnp.maximum(target, 1e-38)) - log_pred), 0.0
    )
    return jnp.mean(pointwise)


def mse(pred: jax.Array, target: jax.Array) -> jax.Array:
    """Mean squared error over all elements."""
    return jnp.mean(jnp.square(pred - target))


def l1(pred: jax.Array, target: jax.Array) -> jax.Array:
    """Mean absolute error over all elements."""
    return jnp.mean(jnp.abs(pred - target))


def _normalize(v: jax.Array, eps: float = 1e-12) -> jax.Array:
    """L2-normalize along the last axis (torch F.normalize semantics)."""
    norm = jnp.linalg.norm(v, axis=-1, keepdims=True)
    return v / jnp.maximum(norm, eps)


def geodesic_aa(
    ypred: jax.Array, ytrue: jax.Array, reduce: bool = True, eps: float = EPS
) -> jax.Array:
    """Geodesic distance between axis-angle poses via quaternion composition.

    |q(ytrue) . q(ypred)| = cos(theta/2) of the relative rotation; theta =
    2*acos(clamp(., +/-(1-eps))) — the differentiable loss form of the
    reference (axisAngle.geodesic_loss, axisAngle.py:103-120).
    """
    angle_p = jnp.linalg.norm(ypred, axis=-1)
    angle_t = jnp.linalg.norm(ytrue, axis=-1)
    axis_p = _normalize(ypred)
    axis_t = _normalize(ytrue)
    dot = jnp.sum(axis_t * axis_p, axis=-1)
    tmp = jnp.abs(
        jnp.cos(angle_t / 2) * jnp.cos(angle_p / 2)
        + jnp.sin(angle_t / 2) * jnp.sin(angle_p / 2) * dot
    )
    theta = 2.0 * jnp.arccos(jnp.clip(tmp, -1.0 + eps, 1.0 - eps))
    return jnp.mean(theta) if reduce else theta


def geodesic_quat(
    ypred: jax.Array, ytrue: jax.Array, reduce: bool = True, eps: float = EPS
) -> jax.Array:
    """Geodesic distance between quaternions (pred renormalized, double-cover
    aware) — the loss form of quaternion.geodesic_loss (quaternion.py:149-163).
    """
    ypred = _normalize(ypred)
    tmp = jnp.abs(jnp.sum(ytrue * ypred, axis=-1))
    theta = 2.0 * jnp.arccos(jnp.clip(tmp, -1.0 + eps, 1.0 - eps))
    return jnp.mean(theta) if reduce else theta


def geodesic_rotmat(
    Rpred: jax.Array, Rtrue: jax.Array, reduce: bool = True, eps: float = EPS
) -> jax.Array:
    """Geodesic angle between rotation matrices via the trace formula with the
    loss-style clamp (RiemannianLoss.my_loss, binDeltaLosses.py:220-225).

    trace(R1^T R2) computed as the Frobenius inner product (elementwise — no
    reduced-precision 3x3 MXU matmul).
    """
    tR = 0.5 * (jnp.sum(Rpred * Rtrue, axis=(-2, -1)) - 1.0)
    angle = jnp.arccos(jnp.clip(tR, -1.0 + eps, 1.0 - eps))
    return jnp.mean(angle) if reduce else angle
