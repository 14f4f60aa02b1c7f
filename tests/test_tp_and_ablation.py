"""Tensor-parallel head sharding, mat-crop eval path, warm-start surgery,
ablation split/gamma wiring."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from multi_modal_regression_tpu.data import ClassBalancedIndex, MatCropIndex
from multi_modal_regression_tpu.data.loader import MatCropLoader
from multi_modal_regression_tpu.dictionary import get_gamma
from multi_modal_regression_tpu.dictionary.kmeans import KMeansDictionary
from multi_modal_regression_tpu.models import (
    OneBinDeltaModel,
    PerClassClassificationModel,
)
from multi_modal_regression_tpu.models.surgery import graft_classifier_into_bd
from multi_modal_regression_tpu.parallel.mesh import make_mesh
from multi_modal_regression_tpu.parallel.tp import (
    make_2d_mesh,
    shard_batch_2d,
    shard_state,
)
from multi_modal_regression_tpu.tools.pascal3d_prep import (
    ObjectAnnotation,
    write_original_crops,
)
from multi_modal_regression_tpu.train import Trainer, get_config

CLASSES = ("aeroplane", "bicycle", "boat", "bottle")  # 4: divides tp axis 2
TINY = dict(
    feature_network="resnet18", feature_layer="layer4",
    num_classes=len(CLASSES), N0=512, N1=32, N2=16, N3=8,
    dict_size=4, image_size=32, items_per_batch=2, eval_batch=8,
    max_iterations=1, eval_every=0,
)


@pytest.fixture(scope="module")
def centers():
    rng = np.random.default_rng(11)
    return (0.7 * rng.standard_normal((4, 3))).astype(np.float32)


def _batch(rng, n=16, num_classes=4):
    return {
        "xdata": rng.integers(0, 256, (n, 32, 32, 3), np.uint8),
        "euler": rng.uniform(-90, 90, (n, 3)).astype(np.float32),
        "label": (np.arange(n) % num_classes).astype(np.int32),
        "is_real": np.ones(n, bool),
    }


def test_tp_matches_dp(centers):
    """dp x tp on (4, 2) mesh == pure dp on 1 device, and the head banks
    are actually sharded on the model axis."""
    rng = np.random.default_rng(0)
    batch = _batch(rng)
    cfg = get_config("geodesic_bd", **TINY)
    dict_ = KMeansDictionary(cluster_centers=centers)

    t1 = Trainer(cfg, dictionary=dict_, mesh=make_mesh(jax.devices()[:1]))
    s1 = t1.init_state()
    s1, m1 = t1.train_step_fn("main")(s1, t1.shard_batch(batch))

    mesh = make_2d_mesh(4, 2)
    t2 = Trainer(cfg, dictionary=dict_, mesh=mesh)
    s2 = t2.init_state()
    # head-bank kernels sharded over 'model'
    k = s2.params["bin_models"]["fc1_kernel"]
    assert "model" in str(k.sharding.spec)
    shard_shape = k.sharding.shard_shape(k.shape)
    assert shard_shape[0] == k.shape[0] // 2
    # backbone replicated
    bk = s2.params["feature_model"]["conv1"]["kernel"]
    assert bk.sharding.is_fully_replicated
    s2, m2 = t2.train_step_fn("main")(s2, t2.shard_batch(batch))
    for key in m1:
        np.testing.assert_allclose(
            float(m1[key]), float(m2[key]), rtol=2e-4, atol=1e-5
        )


def test_restore_checkpoint_onto_tp_mesh(tmp_path, centers):
    """Restoring on a ('data','model') mesh re-applies the head-bank
    sharding (round-1 bug: restore device_put the state replicated)."""
    rng = np.random.default_rng(7)
    cfg = get_config("geodesic_bd", **TINY)
    dict_ = KMeansDictionary(cluster_centers=centers)
    mesh = make_2d_mesh(4, 2)
    trainer = Trainer(cfg, dictionary=dict_, workdir=tmp_path, mesh=mesh)
    state = trainer.init_state()
    state, _ = trainer.train_step_fn("main")(state, trainer.shard_batch(_batch(rng)))
    trainer.save_checkpoint(state)

    restored = trainer.restore_checkpoint()
    assert int(restored.step) == 1
    k = restored.params["bin_models"]["fc1_kernel"]
    assert "model" in str(k.sharding.spec)
    assert k.sharding.shard_shape(k.shape)[0] == k.shape[0] // 2
    # the restored (tp-sharded) state trains on: donation requires the
    # layouts to match what the compiled step expects
    restored, m = trainer.train_step_fn("main")(
        restored, trainer.shard_batch(_batch(rng))
    )
    assert np.isfinite(float(m["loss"]))


def test_shard_batch_2d_replicates_over_model():
    rng = np.random.default_rng(1)
    mesh = make_2d_mesh(4, 2)
    batch = shard_batch_2d(_batch(rng), mesh)
    spec = batch["xdata"].sharding.spec
    assert spec[0] == "data"


def test_mat_crop_loader_and_eval(tmp_path, centers):
    """write_original_crops output evaluates through the mat-crop path."""
    import scipy.io as spio

    rng = np.random.default_rng(2)
    for ci, cls in enumerate(CLASSES):
        names = []
        for i in range(2):
            img = rng.integers(0, 255, (80, 90, 3), np.uint8)
            objs = [
                ObjectAnnotation(
                    cls=cls, bbox=np.array([5, 5, 60, 70]),
                    az=rng.uniform(0, 360), el=rng.uniform(-45, 45),
                    ct=rng.uniform(-30, 30), distance=5.0,
                )
            ]
            names += write_original_crops(
                img, objs, f"img{ci}{i}", tmp_path / cls, cls
            )
        spio.savemat(
            str(tmp_path / f"{cls}_info.mat"),
            {"pascal_train": np.array(names), "pascal_val": np.array(names)},
        )
    idx = MatCropIndex(str(tmp_path), "val", classes=CLASSES)
    n = 2 * len(CLASSES)
    assert len(idx) == n
    loader = MatCropLoader(idx, batch_size=3, num_workers=2)
    batches = list(loader)
    total_valid = sum(int(b["valid"].sum()) for b in batches)
    assert total_valid == n
    assert all(b["xdata"].shape[0] == 3 for b in batches)

    cfg = get_config("geodesic_bd", **{**TINY, "image_size": 224})
    trainer = Trainer(cfg, dictionary=KMeansDictionary(cluster_centers=centers))
    state = trainer.init_state()
    ytrue, ypred, labels = trainer.predict(state, loader)
    assert len(ytrue) == n and ypred.shape == (n, 3)


def test_graft_classifier_into_bd(rng, centers):
    kwargs = dict(
        num_classes=4, N0=512, N1=32, N2=16,
        feature_network="resnet18", feature_layer="layer4",
    )
    x = jnp.asarray(rng.standard_normal((2, 32, 32, 3)), jnp.float32)
    label = jnp.zeros((2,), jnp.int32)
    clf = PerClassClassificationModel(**kwargs, num_clusters=4)
    cv = clf.init(jax.random.PRNGKey(0), x, label, train=False)
    bd = OneBinDeltaModel(**kwargs, num_clusters=4, ndim=3)
    bv = bd.init(jax.random.PRNGKey(1), x, label, train=False)
    grafted = graft_classifier_into_bd(bv, cv)
    jax.tree.map(
        lambda a, b: np.testing.assert_array_equal(a, b),
        grafted["params"]["bin_models"], cv["params"]["pose_models"],
    )
    # warm-started bin scores == classifier scores; delta heads fresh
    scores_bd, _ = bd.apply(grafted, x, label, train=False)
    scores_clf = clf.apply(cv, x, label, train=False)
    np.testing.assert_allclose(
        np.asarray(scores_bd), np.asarray(scores_clf), rtol=1e-5
    )


def test_ablation_train_info_suffix(tmp_path):
    """info_suffix='_train_info' reads the ablation split files."""
    import scipy.io as spio
    from PIL import Image

    rng = np.random.default_rng(3)
    cls = "aeroplane"
    (tmp_path / cls).mkdir(parents=True)
    names = []
    for i in range(3):
        name = f"{cls}_x{i}object1_a10.0_e5.0_t0.0_d4.0"
        Image.fromarray(
            rng.integers(0, 255, (16, 16, 3), np.uint8)
        ).save(tmp_path / cls / f"{name}.png")
        names.append(name)
    spio.savemat(
        str(tmp_path / f"{cls}_train_info.mat"),
        {"image_names": np.array(names[:2])},
    )
    idx = ClassBalancedIndex(
        str(tmp_path), "real", classes=(cls,), info_suffix="_train_info"
    )
    assert idx.num_images[0] == 2  # split file, not the 3 PNGs on disk


def test_gamma_auto_from_dictionary(centers):
    """gamma=None derives the RBF width from the dictionary (get_gamma)."""
    from multi_modal_regression_tpu.train.presets import build_problem

    cfg = get_config("ablation_xbd", **TINY)
    assert cfg.gamma is None
    problem = build_problem(cfg, KMeansDictionary(cluster_centers=centers))
    want = get_gamma(centers)
    # the derived gamma shapes the soft targets: compare against an explicit
    # problem built with that gamma
    from multi_modal_regression_tpu.train.problems import make_problem

    explicit = make_problem("relaxed_kmeans", centers, gamma=want)
    y = jnp.asarray(0.3 * np.random.default_rng(4).standard_normal((5, 3)),
                    jnp.float32)
    np.testing.assert_allclose(
        np.asarray(problem.targets(y)["soft"]),
        np.asarray(explicit.targets(y)["soft"]),
        rtol=1e-6,
    )


def test_tp_matches_dp_multires(centers):
    """The multires model (OneDeltaPerBinModel: classes x clusters delta
    heads — THE tp motivator, 548 M at full config) shards its 16-head
    delta bank on the model axis and matches pure dp step metrics."""
    rng = np.random.default_rng(3)
    batch = _batch(rng)
    cfg = get_config("geodesic_bd_multires", **TINY)
    dict_ = KMeansDictionary(cluster_centers=centers)

    t1 = Trainer(cfg, dictionary=dict_, mesh=make_mesh(jax.devices()[:1]))
    s1 = t1.init_state()
    s1, m1 = t1.train_step_fn("main")(s1, t1.shard_batch(batch))

    mesh = make_2d_mesh(4, 2)
    t2 = Trainer(cfg, dictionary=dict_, mesh=mesh)
    s2 = t2.init_state()
    # the (classes*clusters, ...) delta bank is the sharded one
    k = s2.params["res_models"]["fc1_kernel"]
    assert k.shape[0] == len(CLASSES) * cfg.dict_size
    assert "model" in str(k.sharding.spec)
    assert k.sharding.shard_shape(k.shape)[0] == k.shape[0] // 2
    # Adam moments of the bank shard identically (capacity is the point)
    mu = jax.tree_util.tree_leaves_with_path(s2.opt_state)
    mu_bank = [
        a for p, a in mu
        if "res_models" in str(p) and "fc1_kernel" in str(p)
    ]
    assert mu_bank and all(
        "model" in str(a.sharding.spec) for a in mu_bank
    )
    s2, m2 = t2.train_step_fn("main")(s2, t2.shard_batch(batch))
    for key in m1:
        np.testing.assert_allclose(
            float(m1[key]), float(m2[key]), rtol=2e-4, atol=1e-5
        )
