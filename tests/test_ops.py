"""Pallas ops: interpreter-mode numerics vs the XLA fallbacks."""

import jax
import jax.numpy as jnp
import numpy as np

from multi_modal_regression_tpu.data.loader import normalize_images
from multi_modal_regression_tpu.data.targets import pairwise_sqeuclidean
from multi_modal_regression_tpu.ops.assign import _pallas_assign, assign_bins_pallas
from multi_modal_regression_tpu.ops.preprocess import (
    _pallas_normalize,
    normalize_images_pallas,
)


def _interpreted(fn, *args, **kwargs):
    from jax.experimental.pallas import tpu as pltpu

    with pltpu.force_tpu_interpret_mode():
        return fn(*args, **kwargs)


def test_preprocess_kernel_matches_fallback(rng):
    x = jnp.asarray(rng.integers(0, 256, (4, 16, 8, 3), np.uint8))
    want = np.asarray(normalize_images(x))
    got = np.asarray(_interpreted(_pallas_normalize, x, jnp.float32, 8))
    np.testing.assert_allclose(got, want, rtol=1e-6, atol=1e-7)


def test_preprocess_kernel_uneven_rows(rng):
    # rows (B*H = 4*5 = 20) not divisible by the 8-row tile
    x = jnp.asarray(rng.integers(0, 256, (4, 5, 8, 3), np.uint8))
    want = np.asarray(normalize_images(x))
    got = np.asarray(_interpreted(_pallas_normalize, x, jnp.float32, 8))
    np.testing.assert_allclose(got, want, rtol=1e-6, atol=1e-7)


def test_preprocess_auto_selects_fallback_on_cpu(rng):
    x = jnp.asarray(rng.integers(0, 256, (2, 8, 8, 3), np.uint8))
    got = np.asarray(normalize_images_pallas(x))  # cpu backend -> fallback
    np.testing.assert_allclose(got, np.asarray(normalize_images(x)), rtol=1e-6)


def test_assign_kernel_matches_fallback(rng):
    y = jnp.asarray(rng.standard_normal((257, 3)), jnp.float32)
    centers = jnp.asarray(rng.standard_normal((16, 3)), jnp.float32)
    want = np.argmin(np.asarray(pairwise_sqeuclidean(y, centers)), axis=-1)
    got = np.asarray(_interpreted(_pallas_assign, y, centers, 64))
    np.testing.assert_array_equal(got, want)


def test_assign_auto_fallback_on_cpu(rng):
    y = jnp.asarray(rng.standard_normal((32, 3)), jnp.float32)
    centers = jnp.asarray(rng.standard_normal((5, 3)), jnp.float32)
    got = np.asarray(assign_bins_pallas(y, centers))
    want = np.argmin(np.asarray(pairwise_sqeuclidean(y, centers)), axis=-1)
    np.testing.assert_array_equal(got, want)
