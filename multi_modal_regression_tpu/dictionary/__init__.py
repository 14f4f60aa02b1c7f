"""Pose-dictionary learning: kmeans (Lloyd's) and GMM (EM) over pose targets.

Replaces the reference's host-side sklearn KMeans/GaussianMixture pickles
(learnKmeansDictionary.py, learnGMMDictionary.py) with jit-compiled JAX
implementations serialized as plain npz arrays.
"""

from multi_modal_regression_tpu.dictionary.kmeans import (
    KMeansDictionary,
    fit_kmeans,
    kmeans_assign,
)
from multi_modal_regression_tpu.dictionary.gmm import (
    GMMDictionary,
    fit_gmm,
)
from multi_modal_regression_tpu.dictionary.common import get_gamma

__all__ = [
    "KMeansDictionary",
    "fit_kmeans",
    "kmeans_assign",
    "GMMDictionary",
    "fit_gmm",
    "get_gamma",
]
