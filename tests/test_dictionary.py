"""Dictionary learning tests: kmeans / GMM recover planted clusters; parity
with sklearn/scipy conventions where applicable."""

import numpy as np
import pytest

from multi_modal_regression_tpu.dictionary import (
    fit_kmeans,
    kmeans_assign,
    fit_gmm,
    get_gamma,
    KMeansDictionary,
    GMMDictionary,
)


def planted_clusters(rng, k=4, per=100, d=3, spread=0.05):
    centers = rng.uniform(-2, 2, (k, d))
    pts = centers[np.repeat(np.arange(k), per)] + spread * rng.standard_normal((k * per, d))
    return centers, pts.astype(np.float32)


class TestKMeans:
    def test_recovers_planted_centers(self, rng):
        true_centers, pts = planted_clusters(rng)
        d = fit_kmeans(pts, 4, seed=0)
        # each true center should be within spread of some fitted center
        dist = np.linalg.norm(true_centers[:, None] - d.cluster_centers[None], axis=-1)
        assert np.all(dist.min(axis=1) < 0.1)

    def test_predict_matches_nearest(self, rng):
        _, pts = planted_clusters(rng)
        d = fit_kmeans(pts, 4, seed=0)
        bins = d.predict(pts)
        dist = np.linalg.norm(pts[:, None] - d.cluster_centers[None], axis=-1)
        np.testing.assert_array_equal(bins, dist.argmin(axis=1))

    def test_residuals(self, rng):
        _, pts = planted_clusters(rng)
        d = fit_kmeans(pts, 4, seed=0)
        res = d.residuals(pts)
        bins = d.predict(pts)
        np.testing.assert_allclose(res, pts - d.cluster_centers[bins], atol=1e-6)

    def test_save_load_roundtrip(self, rng, tmp_path):
        _, pts = planted_clusters(rng)
        d = fit_kmeans(pts, 4, seed=0)
        p = tmp_path / "kmeans.npz"
        d.save(p)
        d2 = KMeansDictionary.load(p)
        np.testing.assert_array_equal(d.cluster_centers, d2.cluster_centers)

    def test_sklearn_quality_parity(self, rng):
        """Our inertia should be within a few percent of sklearn's."""
        from sklearn.cluster import KMeans

        _, pts = planted_clusters(rng, k=8, per=60, spread=0.3)
        ours = fit_kmeans(pts, 8, seed=0, n_init=4)
        sk = KMeans(8, n_init=4, random_state=0).fit(pts)
        assert ours.inertia <= sk.inertia_ * 1.05


class TestGMM:
    def test_recovers_planted_means(self, rng):
        true_centers, pts = planted_clusters(rng)
        g = fit_gmm(pts, 4, seed=0)
        dist = np.linalg.norm(true_centers[:, None] - g.means[None], axis=-1)
        assert np.all(dist.min(axis=1) < 0.1)

    def test_predict_proba_normalized(self, rng):
        _, pts = planted_clusters(rng)
        g = fit_gmm(pts, 4, seed=0)
        p = g.predict_proba(pts)
        assert p.shape == (len(pts), 4)
        np.testing.assert_allclose(p.sum(axis=1), 1.0, atol=1e-5)
        assert np.all(p >= 0)

    def test_confident_on_tight_clusters(self, rng):
        _, pts = planted_clusters(rng, spread=0.02)
        g = fit_gmm(pts, 4, seed=0)
        p = g.predict_proba(pts)
        assert np.mean(p.max(axis=1) > 0.99) > 0.95

    def test_save_load_roundtrip(self, rng, tmp_path):
        _, pts = planted_clusters(rng)
        g = fit_gmm(pts, 4, seed=0)
        p = tmp_path / "gmm.npz"
        g.save(p)
        g2 = GMMDictionary.load(p)
        np.testing.assert_array_equal(g.means, g2.means)
        np.testing.assert_array_equal(g.covariances, g2.covariances)


class TestGamma:
    def test_matches_reference_formula(self, rng):
        centers = rng.standard_normal((10, 3))
        from scipy.spatial.distance import cdist

        D = cdist(centers, centers, "sqeuclidean")
        np.fill_diagonal(D, np.inf)
        expect = 1.0 / (2.0 * D.min(axis=1).min())
        np.testing.assert_allclose(get_gamma(centers), expect, rtol=1e-5)
