"""Shared dictionary utilities."""

from __future__ import annotations

import jax.numpy as jnp


def pairwise_sqeuclidean(x: jnp.ndarray, y: jnp.ndarray) -> jnp.ndarray:
    """Squared Euclidean distances between rows of x (N, D) and y (K, D).

    Uses the expansion |x|^2 - 2<x,y> + |y|^2 so the inner product is one
    (N, K) matmul (MXU-friendly), clamped at zero against cancellation.
    """
    # promote BEFORE squaring: with mixed inputs (f64 poses vs the f32
    # stored dictionary under the x64 parity harness) computing |y|^2 in
    # f32 injects 1e-7-level error into otherwise-f64 distances; a no-op
    # for the ordinary same-dtype calls
    dt = jnp.promote_types(x.dtype, y.dtype)
    x, y = x.astype(dt), y.astype(dt)
    x2 = jnp.sum(x * x, axis=-1, keepdims=True)
    y2 = jnp.sum(y * y, axis=-1, keepdims=True).T
    d = x2 - 2.0 * (x @ y.T) + y2
    return jnp.maximum(d, 0.0)


def get_gamma(centers) -> float:
    """RBF bandwidth from a dictionary: 1 / (2 * min over atoms of the
    distance-squared to its nearest other atom).

    Used by the relaxed/soft-bin models to pick the soft-assignment
    temperature from the dictionary geometry (reference:
    helperFunctions.get_gamma, helperFunctions.py:51-58).
    """
    import numpy as np

    centers = np.asarray(centers, dtype=np.float64)
    d = np.array(pairwise_sqeuclidean(jnp.asarray(centers), jnp.asarray(centers)))
    np.fill_diagonal(d, np.inf)
    nearest = d.min(axis=1)
    return float(1.0 / (2.0 * nearest.min()))
