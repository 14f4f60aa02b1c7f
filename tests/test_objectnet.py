"""ObjectNet3D protocol: analytic quaternion dictionary, label-concat
presets, flat single-loader training."""

import jax.numpy as jnp
import numpy as np
import pytest

from multi_modal_regression_tpu.data import FlatLoader, FlatTestIndex, TestLoader
from multi_modal_regression_tpu.dictionary.kmeans import KMeansDictionary
from multi_modal_regression_tpu.tools.synthetic import generate_pose_dataset
from multi_modal_regression_tpu.train import Trainer, get_config
from multi_modal_regression_tpu.train.problems import (
    make_problem,
    objectnet_quaternion_dictionary,
)

CLASSES = ("bed", "bookshelf", "camera")
TINY = dict(
    feature_network="resnet18", feature_layer="layer4",
    num_classes=len(CLASSES), N0=512, N1=32, N2=16, N3=8,
    image_size=32, eval_batch=8, num_warmup_epochs=1, num_epochs=1,
    max_iterations=2, eval_every=0,
)


@pytest.fixture(scope="module")
def dataset(tmp_path_factory):
    root = tmp_path_factory.mktemp("objnet")
    return generate_pose_dataset(
        root, classes=CLASSES, images_per_class=8, image_size=32, seed=9
    )


def test_analytic_quaternion_dictionary():
    D = np.asarray(objectnet_quaternion_dictionary())
    assert D.shape == (16, 4)
    np.testing.assert_allclose(np.linalg.norm(D, axis=-1), 1.0, rtol=1e-6)
    # reference row order spot checks (learnObjectnetModel.py:60-66)
    np.testing.assert_allclose(D[0], [1, 0, 0, 0])
    s = 1 / np.sqrt(2)
    np.testing.assert_allclose(D[4], [s, s, 0, 0], rtol=1e-6)
    np.testing.assert_allclose(D[10], [s, -s, 0, 0], rtol=1e-6)
    np.testing.assert_allclose(D[15], [0, 0, s, -s], rtol=1e-6)


def test_objectnet_quat_problem_targets(rng):
    p = make_problem("objectnet_quat")
    q = rng.standard_normal((8, 4)).astype(np.float32)
    q /= np.linalg.norm(q, axis=-1, keepdims=True)
    tg = p.targets(jnp.asarray(q))
    D = np.asarray(objectnet_quaternion_dictionary())
    want_bins = np.argmax(np.abs(q @ D.T), axis=-1)
    np.testing.assert_array_equal(np.asarray(tg["bins"]), want_bins)
    np.testing.assert_allclose(
        np.asarray(tg["res"]), q - D[want_bins], rtol=1e-5
    )
    # decode renormalizes
    scores = jnp.asarray(rng.standard_normal((8, 16)), jnp.float32)
    res = jnp.asarray(0.1 * rng.standard_normal((8, 4)), jnp.float32)
    decoded = np.asarray(p.decode((scores, res)))
    np.testing.assert_allclose(np.linalg.norm(decoded, axis=-1), 1.0, rtol=1e-5)


def test_flat_loader(dataset):
    idx = FlatTestIndex(str(dataset), classes=CLASSES)
    loader = FlatLoader(idx, batch_size=6, image_size=32, seed=0, num_workers=2)
    batches = list(loader)
    assert len(batches) == len(idx) // 6
    assert all(b["xdata"].shape == (6, 32, 32, 3) for b in batches)
    # shuffling covers distinct images across epochs
    seen = {tuple(b["label"].tolist()) for b in batches}
    assert seen


@pytest.mark.parametrize(
    "preset", ["objectnet_quat", "objectnet_bd", "objectnet_regression",
               "objectnet_classification"]
)
def test_objectnet_presets_single_loader(dataset, preset):
    rng = np.random.default_rng(1)
    centers = (0.7 * rng.standard_normal((5, 3))).astype(np.float32)
    over = dict(TINY)
    if preset in ("objectnet_bd", "objectnet_classification"):
        over["dict_size"] = 5
    cfg = get_config(preset, **over)
    dictionary = (
        None if preset == "objectnet_quat"
        else KMeansDictionary(cluster_centers=centers)
    )
    trainer = Trainer(cfg, dictionary=dictionary)
    idx = FlatTestIndex(str(dataset), classes=CLASSES)
    train_loader = FlatLoader(idx, batch_size=6, image_size=32, num_workers=2)
    test_loader = TestLoader(idx, cfg.eval_batch, cfg.image_size, num_workers=2)
    state = trainer.init_state()
    # single-loader protocol: render_loader=None
    state = trainer.fit(state, train_loader, None)
    assert int(state.step) == 2 * 2  # 2 epochs x max_iterations
    med = trainer.evaluate(state, test_loader)
    assert np.isfinite(med)
