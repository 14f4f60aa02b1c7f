"""Joint cat+pose training: objectives, presets, freezing, surgery, evaluator."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from multi_modal_regression_tpu.data import (
    BalancedLoader,
    ClassBalancedIndex,
    FlatTestIndex,
    TestLoader,
)
from multi_modal_regression_tpu.dictionary.kmeans import KMeansDictionary
from multi_modal_regression_tpu.models import (
    JointCatPoseBDModel,
    OneBinDeltaModel,
    graft_oracle_into_joint,
)
from multi_modal_regression_tpu.tools.synthetic import generate_pose_dataset
from multi_modal_regression_tpu.train import (
    SnapshotEnsembleEvaluator,
    Trainer,
    ensemble_poses,
    get_config,
    make_joint_problem,
    masked_cross_entropy,
)

CLASSES = ("aeroplane", "bicycle", "boat")
TINY = dict(
    feature_network="resnet18", feature_layer="layer4",
    num_classes=len(CLASSES), N0=512, N1=32, N2=16, N3=8,
    dict_size=5, image_size=32, items_per_batch=2, eval_batch=8,
    num_warmup_epochs=1, num_epochs=1, max_iterations=2, eval_every=0,
)


@pytest.fixture(scope="module")
def dataset(tmp_path_factory):
    root = tmp_path_factory.mktemp("joint_data")
    return generate_pose_dataset(
        root, classes=CLASSES, images_per_class=6, image_size=32, seed=4
    )


@pytest.fixture(scope="module")
def centers():
    rng = np.random.default_rng(5)
    return (0.7 * rng.standard_normal((5, 3))).astype(np.float32)


def _loaders(dataset, cfg):
    real = ClassBalancedIndex(str(dataset), "real", classes=CLASSES)
    render = ClassBalancedIndex(str(dataset), "render", classes=CLASSES)
    test = FlatTestIndex(str(dataset), classes=CLASSES)
    return (
        BalancedLoader(real, cfg.items_per_batch, cfg.image_size, num_workers=2),
        BalancedLoader(render, cfg.items_per_batch, cfg.image_size, num_workers=2),
        TestLoader(test, cfg.eval_batch, cfg.image_size, num_workers=2),
    )


def test_masked_cross_entropy(rng):
    logits = jnp.asarray(rng.standard_normal((6, 4)), jnp.float32)
    labels = jnp.asarray(rng.integers(0, 4, 6), jnp.int32)
    mask = jnp.asarray([1, 1, 1, 0, 0, 0], bool)
    got = float(masked_cross_entropy(logits, labels, mask))
    logp = np.asarray(jax.nn.log_softmax(logits, -1))
    want = -np.mean(logp[np.arange(3), np.asarray(labels)[:3]])
    np.testing.assert_allclose(got, want, rtol=1e-5)


@pytest.mark.parametrize(
    "name", ["joint_bd", "joint_reg", "elhoseiny_bd", "elhoseiny_reg", "category"]
)
def test_joint_problem_losses_finite(rng, name, centers):
    p = make_joint_problem(name, centers)
    y = jnp.asarray(0.5 * rng.standard_normal((6, 3)), jnp.float32)
    tg = dict(p.targets(y))
    tg["class_label"] = jnp.asarray(rng.integers(0, 3, 6), jnp.int32)
    tg["is_real"] = jnp.asarray([1, 1, 1, 0, 0, 0], bool)
    cat = jnp.asarray(rng.standard_normal((6, 3)), jnp.float32)
    if name in ("joint_bd", "elhoseiny_bd"):
        out = (
            cat,
            jnp.asarray(rng.standard_normal((6, 5)), jnp.float32),
            jnp.asarray(0.1 * rng.standard_normal((6, 3)), jnp.float32),
        )
    else:
        out = (cat, jnp.asarray(0.5 * rng.standard_normal((6, 3)), jnp.float32))
    for losses in (p.warmup_losses, p.main_losses):
        lc, lr = losses(out, tg)
        assert np.isfinite(float(lc)) and np.isfinite(float(lr))
    assert np.all(np.isfinite(np.asarray(p.decode(out))))


@pytest.mark.parametrize(
    "preset", ["joint_cat_pose_weighted", "joint_cat_pose3_top1", "elhoseiny_bd"]
)
def test_joint_presets_train_steps(dataset, centers, preset):
    cfg = get_config(preset, **TINY)
    trainer = Trainer(cfg, dictionary=KMeansDictionary(cluster_centers=centers))
    real, render, test = _loaders(dataset, cfg)
    state = trainer.init_state()
    state = trainer.fit(state, real, render)
    assert int(state.step) == 4
    med = trainer.evaluate(state, test)
    assert np.isfinite(med)


def test_cat_given_pose_freezes_oracle(dataset, centers):
    """train_only=('fc',) leaves every non-fc param untouched."""
    cfg = get_config("cat_given_pose", **TINY)
    trainer = Trainer(cfg, dictionary=KMeansDictionary(cluster_centers=centers))
    real, render, _ = _loaders(dataset, cfg)
    state0 = trainer.init_state()
    before = jax.device_get(state0.params)
    state = trainer.run_epoch(state0, real, render, "main")
    after = jax.device_get(state.params)
    # fc moved
    moved = jax.tree.reduce(
        lambda a, b: a + b,
        jax.tree.map(
            lambda a, b: float(np.abs(a - b).sum()), before["fc"], after["fc"]
        ),
    )
    assert moved > 0
    # everything else identical
    for key in before:
        if key == "fc":
            continue
        jax.tree.map(
            lambda a, b: np.testing.assert_array_equal(a, b),
            before[key], after[key],
        )


def test_graft_oracle_into_joint_v1(rng, centers):
    kwargs = dict(
        num_classes=3, num_clusters=5, N0=512, N1=32, N2=16, ndim=3,
        feature_network="resnet18", feature_layer="layer4",
    )
    x = jnp.asarray(rng.standard_normal((2, 32, 32, 3)), jnp.float32)
    label = jnp.zeros((2,), jnp.int32)
    oracle = OneBinDeltaModel(**kwargs)
    ov = oracle.init(jax.random.PRNGKey(0), x, label, train=False)
    joint = JointCatPoseBDModel(**kwargs, mixing="weighted")
    jv = joint.init(jax.random.PRNGKey(1), x, train=False)
    grafted = graft_oracle_into_joint(jv, ov, "joint_bd_v1")
    # oracle modules copied, fc kept from the joint init
    jax.tree.map(
        lambda a, b: np.testing.assert_array_equal(a, b),
        grafted["params"]["bin_models"], ov["params"]["bin_models"],
    )
    jax.tree.map(
        lambda a, b: np.testing.assert_array_equal(a, b),
        grafted["params"]["feature_model"], ov["params"]["feature_model"],
    )
    jax.tree.map(
        lambda a, b: np.testing.assert_array_equal(a, b),
        grafted["params"]["fc"], jv["params"]["fc"],
    )
    # the grafted tree runs
    out = joint.apply(grafted, x, train=False)
    assert len(out) == 3


def test_ensemble_poses_identity():
    """Averaging identical snapshots returns them (both representations)."""
    rng = np.random.default_rng(0)
    y = 0.6 * rng.standard_normal((10, 3))
    got = ensemble_poses([y, y, y], "axis_angle")
    np.testing.assert_allclose(got, y, atol=1e-5)
    q = rng.standard_normal((10, 4))
    q /= np.linalg.norm(q, axis=-1, keepdims=True)
    got_q = ensemble_poses([q, -q], "quaternion")  # double cover handled
    dot = np.abs(np.sum(got_q * q, axis=-1))
    np.testing.assert_allclose(dot, 1.0, atol=1e-6)


def test_evaluator_budget_caps_whole_run(dataset, centers):
    """max_iterations * epochs is ONE per-run budget: the fine-tune stops
    for good once spent (round-1 bug: each later epoch re-entered and ran
    one extra batch)."""
    cfg = get_config("geodesic_bd", **{**TINY, "max_iterations": 2})
    trainer = Trainer(cfg, dictionary=KMeansDictionary(cluster_centers=centers))
    real, render, test = _loaders(dataset, cfg)
    # 6 imgs/class at 2 items/batch -> 3 batches/epoch; 3 epochs uncapped
    # would be 9 steps, the budget is 2 * 3 = 6
    ev = SnapshotEnsembleEvaluator(trainer, cycle_len=100)
    state = ev.run(trainer.init_state(), real, render, test, num_epochs=3)
    assert int(state.step) == 6


def test_evaluator_dual_stream_bn_wiring(dataset, centers):
    """The evaluate scripts' fine-tune loop is two-forward in the reference
    (evaluateGeodesicBDModel.py:112-117), so with dual loaders the
    evaluator's compiled step must run per-stream BN. Wiring check: the
    same seeded run differs between bn_per_stream on/off (the split
    actually engages — per-stream statistics change the forward), while
    the step/loss values stay finite. The step function itself is
    certified against the reference's own modules at f64 in
    test_torch_dynamics.test_geodesic_bd_dual_stream_dynamics_x64_strict."""
    import dataclasses

    base = get_config("geodesic_bd", **{**TINY, "max_iterations": 2})
    histories = {}
    for flag in (True, False):
        cfg = dataclasses.replace(base, bn_per_stream=flag)
        trainer = Trainer(
            cfg, dictionary=KMeansDictionary(cluster_centers=centers)
        )
        real, render, test = _loaders(dataset, cfg)
        ev = SnapshotEnsembleEvaluator(
            trainer, cycle_len=100, record_history=True
        )
        ev.run(trainer.init_state(), real, render, test, num_epochs=1)
        histories[flag] = [h["loss"] for h in ev.history]
    assert len(histories[True]) == len(histories[False]) > 0
    assert all(np.isfinite(v) for v in histories[True])
    assert histories[True] != histories[False], (
        "dual loaders + bn_per_stream did not change the evaluator step"
    )


def test_snapshot_ensemble_evaluator(dataset, centers, tmp_path):
    cfg = get_config("geodesic_bd", **{**TINY, "eval_num_epochs": 1})
    trainer = Trainer(cfg, dictionary=KMeansDictionary(cluster_centers=centers))
    real, render, test = _loaders(dataset, cfg)
    state = trainer.init_state()
    ev = SnapshotEnsembleEvaluator(
        trainer, cycle_len=2, workdir=tmp_path / "snaps"
    )
    state = ev.run(state, real, render, test, num_epochs=1)
    assert len(ev.snapshots) >= 1
    med, ypred = ev.ensemble()
    assert np.isfinite(med)
    assert (tmp_path / "snaps" / "num0.npz").exists()
