"""Gaussian-mixture pose-dictionary learning (full-covariance EM), jit-compiled.

TPU-native replacement for the reference's sklearn GaussianMixture(K,
covariance_type='full', n_init=10) (learnGMMDictionary.py:41-47). EM runs as a
compiled lax.fori_loop; responsibilities are computed with a stable
log-sum-exp. Serialized as npz arrays (means / covariances / weights).
"""

from __future__ import annotations

import dataclasses
import functools
from pathlib import Path

import jax
import jax.numpy as jnp
import numpy as np

from multi_modal_regression_tpu.dictionary.kmeans import _kmeans_pp_init


@dataclasses.dataclass
class GMMDictionary:
    """A fitted GMM pose dictionary."""

    means: np.ndarray  # (K, D)
    covariances: np.ndarray  # (K, D, D)
    weights: np.ndarray  # (K,)
    log_likelihood: float = 0.0

    @property
    def n_components(self) -> int:
        return int(self.means.shape[0])

    def predict_proba(self, y: np.ndarray) -> np.ndarray:
        """Posterior responsibilities (N, K) — the reference's soft bins."""
        return np.asarray(
            _log_resp(
                jnp.asarray(y, jnp.float32),
                jnp.asarray(self.means, jnp.float32),
                jnp.asarray(self.covariances, jnp.float32),
                jnp.asarray(self.weights, jnp.float32),
            )[0]
        )

    def predict(self, y: np.ndarray) -> np.ndarray:
        return np.argmax(self.predict_proba(y), axis=-1)

    def save(self, path: str | Path) -> None:
        np.savez(
            path,
            means=self.means,
            covariances=self.covariances,
            weights=self.weights,
            log_likelihood=self.log_likelihood,
        )

    @classmethod
    def load(cls, path: str | Path) -> "GMMDictionary":
        with np.load(path) as f:
            return cls(
                means=f["means"],
                covariances=f["covariances"],
                weights=f["weights"],
                log_likelihood=float(f["log_likelihood"]),
            )


def _log_gauss(y, means, covs):
    """Per-component log N(y | mu_k, Sigma_k): (N, K)."""
    d = y.shape[-1]
    # Cholesky-based solve per component, vmapped over K
    def per_comp(mu, cov):
        chol = jnp.linalg.cholesky(cov)
        diff = y - mu  # (N, D)
        sol = jax.scipy.linalg.solve_triangular(chol, diff.T, lower=True)  # (D, N)
        maha = jnp.sum(sol * sol, axis=0)  # (N,)
        logdet = 2.0 * jnp.sum(jnp.log(jnp.diagonal(chol)))
        return -0.5 * (maha + logdet + d * jnp.log(2.0 * jnp.pi))

    return jax.vmap(per_comp)(means, covs).T  # (N, K)


def _log_resp(y, means, covs, weights):
    logp = _log_gauss(y, means, covs) + jnp.log(jnp.maximum(weights, 1e-12))[None, :]
    norm = jax.scipy.special.logsumexp(logp, axis=-1, keepdims=True)
    return jnp.exp(logp - norm), jnp.sum(norm)


@functools.partial(jax.jit, static_argnames=("k", "num_iters"))
def _em(key, y, k, num_iters, reg):
    n, d = y.shape
    means = _kmeans_pp_init(key, y, k)
    covs = jnp.broadcast_to(jnp.eye(d, dtype=y.dtype), (k, d, d)) * jnp.var(y)
    weights = jnp.full((k,), 1.0 / k, y.dtype)

    def step(_, carry):
        means, covs, weights, _ = carry
        resp, ll = _log_resp(y, means, covs, weights)  # (N, K)
        nk = jnp.sum(resp, axis=0)  # (K,)
        new_means = (resp.T @ y) / jnp.maximum(nk, 1e-8)[:, None]

        def cov_k(mu, r):
            diff = y - mu  # (N, D)
            c = (diff * r[:, None]).T @ diff / jnp.maximum(jnp.sum(r), 1e-8)
            return c + reg * jnp.eye(d, dtype=y.dtype)

        new_covs = jax.vmap(cov_k)(new_means, resp.T)
        new_weights = nk / n
        return new_means, new_covs, new_weights, ll

    means, covs, weights, ll = jax.lax.fori_loop(
        0, num_iters, step, (means, covs, weights, jnp.float32(0.0))
    )
    return means, covs, weights, ll


def fit_gmm(
    y: np.ndarray,
    n_components: int,
    *,
    num_iters: int = 100,
    n_init: int = 4,
    seed: int = 0,
    reg_covar: float = 1e-6,
) -> GMMDictionary:
    """Fit a full-covariance GMM pose dictionary; best of n_init restarts."""
    yj = jnp.asarray(y, dtype=jnp.float32)
    best = None
    best_ll = -np.inf
    for r in range(n_init):
        means, covs, weights, ll = _em(
            jax.random.key(seed + r), yj, n_components, num_iters, reg_covar
        )
        ll = float(ll)
        if ll > best_ll:
            best = (np.asarray(means), np.asarray(covs), np.asarray(weights))
            best_ll = ll
    return GMMDictionary(
        means=best[0], covariances=best[1], weights=best[2], log_likelihood=best_ll
    )
