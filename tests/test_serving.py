"""Serving export: AOT serialize/deserialize roundtrip matches live apply."""

import numpy as np
import pytest

from multi_modal_regression_tpu.dictionary.kmeans import KMeansDictionary
from multi_modal_regression_tpu.serving import (
    export_inference,
    load_inference,
    make_inference_fn,
    save_inference,
)
from multi_modal_regression_tpu.train import Trainer, get_config

TINY = dict(
    feature_network="resnet18", feature_layer="layer4",
    num_classes=3, N0=512, N1=32, N2=16, dict_size=5, image_size=32,
)


@pytest.fixture(scope="module")
def trainer_state():
    rng = np.random.default_rng(0)
    centers = (0.7 * rng.standard_normal((5, 3))).astype(np.float32)
    cfg = get_config("geodesic_bd", **TINY)
    trainer = Trainer(cfg, dictionary=KMeansDictionary(cluster_centers=centers))
    return trainer, trainer.init_state()


def test_export_roundtrip_matches_live(trainer_state, tmp_path):
    trainer, state = trainer_state
    rng = np.random.default_rng(1)
    images = rng.integers(0, 256, (4, 32, 32, 3), np.uint8)
    labels = (np.arange(4) % 3).astype(np.int32)

    live = np.asarray(make_inference_fn(trainer, state)(images, labels))

    exported = export_inference(trainer, state, batch_size=4, image_size=32)
    path = tmp_path / "model.stablehlo"
    save_inference(path, exported)
    assert path.stat().st_size > 1000  # weights embedded

    served = load_inference(path)
    got = np.asarray(served(images, labels))
    np.testing.assert_allclose(got, live, rtol=1e-5, atol=1e-6)
    assert got.shape == (4, 3)


def test_export_with_raw_size_inputs(trainer_state, tmp_path):
    """Exporting with a larger input size fuses the device resize into the
    artifact, so raw-size images serve directly."""
    trainer, state = trainer_state
    rng = np.random.default_rng(2)
    exported = export_inference(trainer, state, batch_size=2, image_size=48)
    raw = rng.integers(0, 256, (2, 48, 48, 3), np.uint8)
    labels = np.array([0, 1], np.int32)
    out = np.asarray(exported.call(raw, labels))
    assert out.shape == (2, 3) and np.all(np.isfinite(out))


def test_export_dynamic_batch(trainer_state, tmp_path):
    """batch_size='dynamic' exports ONE artifact with a symbolic batch dim
    that serves any batch size, matching fixed-shape exports exactly."""
    trainer, state = trainer_state
    rng = np.random.default_rng(3)
    exported = export_inference(
        trainer, state, batch_size="dynamic", image_size=32
    )
    path = tmp_path / "model_dyn.stablehlo"
    save_inference(path, exported)
    served = load_inference(path)
    for b in (2, 7):
        images = rng.integers(0, 256, (b, 32, 32, 3), np.uint8)
        labels = (np.arange(b) % 3).astype(np.int32)
        got = np.asarray(served(images, labels))
        live = np.asarray(make_inference_fn(trainer, state)(images, labels))
        np.testing.assert_allclose(got, live, rtol=1e-5, atol=1e-6)
        assert got.shape == (b, 3)
