"""KMeans pose-dictionary learning, jit-compiled (Lloyd's algorithm).

TPU-native replacement for the reference's host-side sklearn
KMeans(n_clusters=K).fit over all render poses (learnKmeansDictionary.py:41-47):
kmeans++ seeding and Lloyd iterations run as compiled XLA programs; assignment
is a single (N, K) distance matmul + argmin. The fitted dictionary is stored
as a plain array in an .npz (no pickle coupling to sklearn internals).
"""

from __future__ import annotations

import dataclasses
import functools
from pathlib import Path

import jax
import jax.numpy as jnp
import numpy as np

from multi_modal_regression_tpu.dictionary.common import pairwise_sqeuclidean


@dataclasses.dataclass
class KMeansDictionary:
    """A fitted pose dictionary: cluster centers (K, D) + fit metadata."""

    cluster_centers: np.ndarray
    inertia: float = 0.0

    @property
    def n_clusters(self) -> int:
        return int(self.cluster_centers.shape[0])

    def predict(self, y: np.ndarray) -> np.ndarray:
        """Hard bin assignment: argmin distance to centers (streams through
        the tiled Pallas kernel on TPU — no (N, K) matrix in HBM)."""
        from multi_modal_regression_tpu.ops.assign import assign_bins_pallas

        return np.asarray(
            assign_bins_pallas(
                jnp.asarray(y, jnp.float32), jnp.asarray(self.cluster_centers)
            )
        )

    def residuals(self, y: np.ndarray, bins: np.ndarray | None = None) -> np.ndarray:
        if bins is None:
            bins = self.predict(y)
        return np.asarray(y) - self.cluster_centers[bins]

    def save(self, path: str | Path) -> None:
        np.savez(path, cluster_centers=self.cluster_centers, inertia=self.inertia)

    @classmethod
    def load(cls, path: str | Path) -> "KMeansDictionary":
        with np.load(path) as f:
            return cls(
                cluster_centers=f["cluster_centers"], inertia=float(f["inertia"])
            )


@jax.jit
def kmeans_assign(y: jnp.ndarray, centers: jnp.ndarray) -> jnp.ndarray:
    """Hard assignment of rows of y (N, D) to nearest of centers (K, D)."""
    return jnp.argmin(pairwise_sqeuclidean(y, centers), axis=-1)


def _kmeans_pp_init(key: jax.Array, y: jnp.ndarray, k: int) -> jnp.ndarray:
    """Greedy kmeans++ seeding: for each new center sample 2 + log2(k)
    candidates ∝ distance² to the chosen set and keep the one that minimizes
    the resulting potential (the sklearn-quality variant)."""
    import math

    n = y.shape[0]
    n_trials = 2 + int(math.log2(max(k, 2)))
    key, sub = jax.random.split(key)
    first = y[jax.random.randint(sub, (), 0, n)]
    centers0 = jnp.zeros((k, y.shape[1]), y.dtype).at[0].set(first)
    dmin0 = jnp.sum((y - first) ** 2, axis=-1)

    def body(i, carry):
        key, centers, dmin = carry
        key, sub = jax.random.split(key)
        cand_idx = jax.random.categorical(
            sub, jnp.log(jnp.maximum(dmin, 1e-12)), shape=(n_trials,)
        )
        cand = y[cand_idx]  # (T, D)
        d_cand = pairwise_sqeuclidean(y, cand)  # (N, T)
        new_dmin = jnp.minimum(dmin[:, None], d_cand)  # (N, T)
        best = jnp.argmin(jnp.sum(new_dmin, axis=0))
        return key, centers.at[i].set(cand[best]), new_dmin[:, best]

    _, centers, _ = jax.lax.fori_loop(1, k, body, (key, centers0, dmin0))
    return centers


@functools.partial(jax.jit, static_argnames=("k", "num_iters"))
def _lloyd(key: jax.Array, y: jnp.ndarray, k: int, num_iters: int):
    centers = _kmeans_pp_init(key, y, k)

    def step(_, centers):
        d = pairwise_sqeuclidean(y, centers)
        assign = jnp.argmin(d, axis=-1)
        onehot = jax.nn.one_hot(assign, k, dtype=y.dtype)  # (N, K)
        counts = jnp.sum(onehot, axis=0)  # (K,)
        sums = onehot.T @ y  # (K, D)
        new = sums / jnp.maximum(counts, 1.0)[:, None]
        # keep the old center for empty clusters
        return jnp.where((counts > 0)[:, None], new, centers)

    centers = jax.lax.fori_loop(0, num_iters, step, centers)
    d = pairwise_sqeuclidean(y, centers)
    inertia = jnp.sum(jnp.min(d, axis=-1))
    return centers, inertia


def fit_kmeans(
    y: np.ndarray,
    n_clusters: int,
    *,
    num_iters: int = 100,
    n_init: int = 4,
    seed: int = 0,
) -> KMeansDictionary:
    """Fit a K-atom pose dictionary; best of `n_init` seeded restarts."""
    yj = jnp.asarray(y, dtype=jnp.float32)
    best_c, best_i = None, np.inf
    for r in range(n_init):
        centers, inertia = _lloyd(
            jax.random.key(seed + r), yj, n_clusters, num_iters
        )
        inertia = float(inertia)
        if inertia < best_i:
            best_c, best_i = np.asarray(centers), inertia
    return KMeansDictionary(cluster_centers=best_c, inertia=best_i)
