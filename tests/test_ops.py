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


def test_resize_matches_pil(rng):
    """The matmul resize reproduces PIL BILINEAR (antialiased) pixels."""
    from PIL import Image

    from multi_modal_regression_tpu.ops.augment import resize_images

    for in_s, out_s in ((48, 32), (32, 48), (64, 64)):
        x = rng.integers(0, 256, (2, in_s, in_s, 3), np.uint8)
        got = np.asarray(resize_images(jnp.asarray(x), out_s, out_s))
        for b in range(2):
            want = np.asarray(
                Image.fromarray(x[b]).resize((out_s, out_s), Image.BILINEAR),
                np.float32,
            )
            # PIL quantizes to uint8 per stage; allow ~1 level
            assert np.abs(got[b] - want).max() <= 1.5, (in_s, out_s)


def test_flip_images_and_pose(rng):
    from multi_modal_regression_tpu.ops.augment import (
        flip_images,
        flip_pose_euler,
    )

    x = jnp.asarray(rng.integers(0, 256, (4, 8, 8, 3), np.uint8))
    flip = jnp.asarray([True, False, True, False])
    y = np.asarray(flip_images(x, flip))
    np.testing.assert_array_equal(y[0], np.asarray(x)[0][:, ::-1])
    np.testing.assert_array_equal(y[1], np.asarray(x)[1])
    euler = jnp.asarray(rng.uniform(-90, 90, (4, 3)), jnp.float32)
    e2 = np.asarray(flip_pose_euler(euler, flip))
    np.testing.assert_allclose(e2[0], np.asarray(euler)[0] * [-1, 1, -1])
    np.testing.assert_allclose(e2[1], np.asarray(euler)[1])


def test_device_preprocess_matches_host_path(rng):
    """resize-on-device == host(PIL-free) path when sizes already match."""
    from multi_modal_regression_tpu.data.loader import normalize_images
    from multi_modal_regression_tpu.ops.augment import device_preprocess

    x = jnp.asarray(rng.integers(0, 256, (2, 16, 16, 3), np.uint8))
    got = np.asarray(device_preprocess(x, out_size=16))
    want = np.asarray(normalize_images(x))
    np.testing.assert_allclose(got, want, rtol=1e-5, atol=1e-5)


def test_trainer_device_resize_path(rng, tmp_path):
    """End-to-end: loaders ship 48-px raw images, the step resizes to 32."""
    from multi_modal_regression_tpu.dictionary.kmeans import KMeansDictionary
    from multi_modal_regression_tpu.train import Trainer, get_config

    centers = (0.7 * rng.standard_normal((4, 3))).astype(np.float32)
    cfg = get_config(
        "geodesic_bd", feature_network="resnet18", feature_layer="layer4",
        num_classes=3, N0=512, N1=32, N2=16, dict_size=4,
        image_size=32, device_resize_from=48,
    )
    trainer = Trainer(cfg, dictionary=KMeansDictionary(cluster_centers=centers))
    state = trainer.init_state()
    batch = trainer.shard_batch({
        "xdata": rng.integers(0, 256, (6, 48, 48, 3), np.uint8),  # raw size
        "euler": rng.uniform(-90, 90, (6, 3)).astype(np.float32),
        "label": (np.arange(6) % 3).astype(np.int32),
    })
    state, m = trainer.train_step_fn("main")(state, batch)
    assert np.isfinite(float(m["loss"]))
