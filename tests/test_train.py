"""Training layer: problems, schedules, end-to-end Trainer slice, 1-vs-N mesh."""

import dataclasses

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
from multi_modal_regression_tpu.parallel.mesh import make_mesh
from multi_modal_regression_tpu.tools.synthetic import generate_pose_dataset
from multi_modal_regression_tpu.train import (
    Trainer,
    cyclical_triangular,
    get_config,
    is_snapshot_step,
    make_problem,
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
    root = tmp_path_factory.mktemp("train_data")
    return generate_pose_dataset(
        root, classes=CLASSES, images_per_class=6, image_size=32, seed=2
    )


@pytest.fixture(scope="module")
def centers():
    rng = np.random.default_rng(3)
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


def test_cyclical_schedule_matches_reference_formula():
    """optax schedule == mySGD's 1-based triangular rate
    (helperFunctions.py:112-118)."""
    c, a1, a2 = 10, 1e-6, 1e-8
    sched = cyclical_triangular(c, a1, a2)
    for torch_step in range(1, 25):  # reference state['step'] counts from 1
        t = (np.fmod(torch_step - 1, c) + 1) / c
        if t <= 0.5:
            want = (1 - 2 * t) * a1 + 2 * t * a2
        else:
            want = 2 * (1 - t) * a2 + (2 * t - 1) * a1
        got = float(sched(torch_step - 1))  # optax counts from 0
        np.testing.assert_allclose(got, want, rtol=1e-6)


def test_snapshot_at_lr_minimum():
    """Snapshots land where the LR hits alpha2 (count % c == c/2, 1-based)."""
    c = 8
    snaps = [s for s in range(30) if is_snapshot_step(s, c)]
    sched = cyclical_triangular(c)
    for s in snaps:
        assert float(sched(s)) == pytest.approx(1e-8, rel=1e-6)


@pytest.mark.parametrize(
    "problem_name",
    ["simple", "geodesic", "euclidean", "laplacian", "relaxed_kmeans",
     "riemannian", "log_euclidean", "classification"],
)
def test_problem_losses_finite_and_decodable(rng, problem_name, centers):
    p = make_problem(problem_name, centers)
    y = jnp.asarray(0.5 * rng.standard_normal((8, 3)), jnp.float32)
    tg = p.targets(y)
    scores = jnp.asarray(rng.standard_normal((8, 5)), jnp.float32)
    residual = jnp.asarray(0.1 * rng.standard_normal((8, 3)), jnp.float32)
    out = (scores, residual)
    for losses in (p.warmup_losses, p.main_losses):
        lc, lr = losses(out, tg)
        assert np.isfinite(float(lc)) and np.isfinite(float(lr))
    decoded = p.decode(out)
    assert decoded.shape[0] == 8 and np.all(np.isfinite(np.asarray(decoded)))


def test_problem_balance_forms_match_reference_scripts(centers):
    """The self-balance FORM each script applies, phase by phase — audited
    line-by-line against the reference loops. The two asymmetric corners:
    learnEuclideanBDModel.py keeps the warm-up form (0.5*exp(-2s)*Lr,
    s'=0.5*log Lr) in its MAIN phase too (:178,183 — its evaluate script
    agrees, evaluateEuclideanBDModel.py:128), while geodesic (:180) and
    laplacian (:179) switch to exp(-s)*Lr; and learnRiemannianBDModel.py is
    the one self-balanced two-phase script that never resets s between
    training_init() and training() (only assignment: :133)."""
    forms = {
        "simple": ("warmup", "warmup"),  # learnSimpleBDModel.py:126
        "geodesic": ("warmup", "main"),  # learnGeodesicBDModel.py:128,180
        "euclidean": ("warmup", "warmup"),  # learnEuclideanBDModel.py:126,178
        "laplacian": ("warmup", "main"),  # learnLaplacianBDModel.py:127,179
        "riemannian": ("warmup", "main"),  # learnRiemannianBDModel.py:158,208
        "log_euclidean": ("warmup", "warmup"),  # learnLogEuclideanModel.py:135
        "relaxed_kmeans": (None, None),  # ablationXBDModel fixed weights
        "classification": (None, None),
        # the _rene fine-tune loops: homoscedastic sigma form
        # 1/(2*sigma^2)*Lr + 3*log(sigma), sigma' = sqrt(Lr/3)
        "simple_rene": ("sigma", "sigma"),  # learnSimpleBDModel_rene.py:161-170
        "euclidean_rene": ("sigma", "sigma"),  # learnEuclideanBDModel_rene.py:164-170
    }
    for name, (wb, mb) in forms.items():
        p = make_problem(name, centers)
        assert p.warmup_balance == wb, name
        assert p.main_balance == mb, name
    # the s carry-over across the phase boundary (trainer.fit honors it)
    from multi_modal_regression_tpu.train import get_config

    assert get_config("riemannian_bd").reset_s_between_phases is False
    assert get_config("geodesic_bd").reset_s_between_phases is True
    assert get_config("euclidean_bd").reset_s_between_phases is True


def test_objectnet_epoch_lr_matches_torch_lambdalr():
    """objectnet_epoch_lr_factor vs torch's OWN LambdaLR with the reference
    lambda (learnObjectnetBDModel.py:87), stepped before each training()
    epoch exactly as the script does (:190): warm-up runs at lambda(0)=1,
    main epoch e at lambda(e+1) — across two decades of the schedule."""
    import torch

    from multi_modal_regression_tpu.train.schedules import (
        objectnet_epoch_lr_factor,
    )

    p = torch.nn.Parameter(torch.zeros(1))
    opt = torch.optim.Adam([p], lr=1e-4)
    sched = torch.optim.lr_scheduler.LambdaLR(
        opt, lambda ep: (10 ** -(ep // 10)) / (1 + ep % 10)
    )
    assert opt.param_groups[0]["lr"] == pytest.approx(
        1e-4 * objectnet_epoch_lr_factor(0)
    )
    for epoch in range(25):
        opt.step()  # torch>=1.1 warns if step() precedes any optimizer.step
        sched.step()  # before training() (learnObjectnetBDModel.py:190)
        assert opt.param_groups[0]["lr"] == pytest.approx(
            1e-4 * objectnet_epoch_lr_factor(epoch + 1)
        ), epoch


@pytest.mark.parametrize("kind", ["step", "inv"])
def test_step_and_inv_epoch_lr_match_torch_schedulers(kind):
    """step_epoch_lr_factor vs torch's OWN StepLR(1, 0.1)
    (learnGeodesicRegressionModel.py:114) and inv_epoch_lr_factor vs
    torch's LambdaLR(my_schedule = 1/(1+ep))
    (learnJointCatPoseModel2_top1.py:142-148), stepped before each
    training() epoch exactly as the scripts do: warm-up / pre-loop passes
    run at factor(0)=1, main epoch e at factor(e+1)."""
    import torch

    from multi_modal_regression_tpu.train.schedules import epoch_lr_factor

    p = torch.nn.Parameter(torch.zeros(1))
    opt = torch.optim.Adam([p], lr=1e-4)
    if kind == "step":
        sched = torch.optim.lr_scheduler.StepLR(opt, step_size=1, gamma=0.1)
    else:
        sched = torch.optim.lr_scheduler.LambdaLR(
            opt, lambda ep: 1.0 / (1.0 + ep)
        )
    assert opt.param_groups[0]["lr"] == pytest.approx(
        1e-4 * epoch_lr_factor(kind, 0)
    )
    for epoch in range(12):
        opt.step()
        sched.step()  # before training(), e.g. learnIndependentBDModel.py:255
        assert opt.param_groups[0]["lr"] == pytest.approx(
            1e-4 * epoch_lr_factor(kind, epoch + 1), rel=1e-9
        ), epoch


def test_preset_epoch_lr_decay_table_matches_reference_scripts():
    """Which presets step a per-epoch scheduler, pinned per-script: the
    reference constructs an lr scheduler in 27 scripts and ACTIVELY steps
    it (uncommented scheduler.step() before training()) in all of them —
    StepLR(1, 0.1) in 11 learn* + 4 ablation* scripts, LambdaLR 1/(1+ep)
    in the 10 joint/categorization-family scripts, and the ObjectNet
    LambdaLR in 2. The flagship two-phase BD scripts comment theirs out
    (learnGeodesicBDModel.py:97,243 — audited line-by-line)."""
    table = {
        # StepLR(step_size=1, gamma=0.1), live construction + step:
        "classification": "step",  # learnClassificationModel.py:94,167 (+_new:95)
        "geodesic_regression": "step",  # learnGeodesicRegressionModel.py:114,234
        "geodesic_regression_quaternion": "step",  # ...quaternion.py:99
        "independent_regression": "step",  # learnIndependentRegressionModel.py:92
        "independent_bd": "step",  # learnIndependentBDModel.py:115,255
        "rendered_bd": "step",  # learnRenderedBDModel.py:115,234
        "probabilistic_bd": "step",  # learnProbabilisticBDModel.py:97,204
        "probabilistic_bd_multires": "step",
        "probabilistic_bd_quaternion": "step",  # dormant; mirrors probabilistic_bd
        "probabilistic_bd_quaternion_multires": "step",
        "elhoseiny_bd": "step",  # learnElhoseinyBDModel.py:117
        "elhoseiny_regression": "step",  # learnElhoseinyRegressionModel.py:98
        "relaxed_bd": "step",  # ablationXBDModel.py:96,218
        "ablation_geodesic_bd": "step",  # ablationGeodesicBDModel.py:95,217
        "ablation_xbd": "step",  # ablationXBDModel.py:96,218
        "ablation_gbd_augmentation": "step",  # ablationGBDAugmentation.py:99,205
        "ablation_c0": "step",  # ablationDictionarySizeC0.py:97,168
        # LambdaLR my_schedule = 1/(1+ep):
        "joint_cat_pose_top1": "inv",  # learnJointCatPoseModel_top1.py:141
        "joint_cat_pose_top1_new": "inv",  # ..._top1_new.py:144
        "joint_cat_pose_weighted": "inv",  # ..._weighted.py:140
        "joint_cat_pose2_top1": "inv",  # learnJointCatPoseModel2_top1.py:148
        "joint_cat_pose2_weighted": "inv",  # ..._weighted.py:147
        "joint_cat_pose3_top1": "inv",  # learnJointCatPoseModel3_top1.py:129
        "joint_cat_pose3_weighted": "inv",  # ..._weighted.py:127
        "categorization": "inv",  # learnCategorizationModel.py:69,118
        "cat_given_pose": "inv",  # learnCatGivenPoseModel.py:127,204
        "cat_given_pose3": "inv",  # learnCatGivenPoseModel3.py:127,204
        # ObjectNet LambdaLR 10^-(ep//10)/(1+ep%10):
        "objectnet_quat": "objectnet",  # learnObjectnetModel.py:134,238
        "objectnet_bd": "objectnet",  # learnObjectnetBDModel.py:87,190
        "objectnet_bd_multires": "objectnet",
        # scheduler constructed but scheduler.step() commented out, or no
        # scheduler at all — constant lr:
        "simple_bd": None,
        "simple_bd_rene": None,  # learnSimpleBDModel_rene.py:137,223 (commented)
        "euclidean_bd_rene": None,  # learnEuclideanBDModel_rene.py:137,225 (commented)
        "geodesic_bd": None,  # learnGeodesicBDModel.py:97,243 (commented)
        "geodesic_bd_multires": None,
        "geodesic_bd_quaternion": None,
        "euclidean_bd": None,  # learnEuclideanBDModel.py:95,241 (commented)
        "laplacian_bd": None,
        "log_euclidean_bd": None,
        "riemannian_bd": None,
        "objectnet_regression": None,
        "objectnet_classification": None,
    }
    from multi_modal_regression_tpu.train.presets import PRESETS

    assert set(table) == set(PRESETS)  # every preset audited, none skipped
    for preset, want in table.items():
        assert get_config(preset).epoch_lr_decay == want, preset


def test_train_only_composes_with_epoch_lr_decay(centers):
    """learnCatGivenPoseModel.py freezes the BD oracle (:111-117) AND steps
    its LambdaLR (:127,204): the masked optimizer must live INSIDE the
    injected-lr wrapper — frozen collections get exactly zero update while
    the trainable fc's update scales with the swapped epoch rate."""
    from multi_modal_regression_tpu.train.presets import build_optimizer

    cfg = get_config("cat_given_pose", optimizer_dtype="float32")
    assert cfg.train_only == ("fc",) and cfg.epoch_lr_decay == "inv"
    tx = build_optimizer(cfg)
    params = {
        "fc": {"kernel": jnp.ones((3, 2)), "bias": jnp.zeros((2,))},
        "pose_model": {"w": jnp.ones((4,))},
    }
    grads = jax.tree.map(lambda p: jnp.full_like(p, 0.5), params)
    opt_state = tx.init(params)
    # epoch 3 (0-based) runs at init_lr * 1/(1+4) (scheduler.step() x4)
    from multi_modal_regression_tpu.train.schedules import epoch_lr_factor

    hp = dict(opt_state.hyperparams)
    hp["learning_rate"] = jnp.asarray(
        cfg.init_lr * epoch_lr_factor("inv", 4), jnp.float32
    )
    opt_state = opt_state._replace(hyperparams=hp)
    updates, _ = tx.update(grads, opt_state, params)
    np.testing.assert_array_equal(
        np.asarray(updates["pose_model"]["w"]), 0.0
    )  # frozen oracle
    # first Adam step: |update| = lr elementwise (up to eps)
    np.testing.assert_allclose(
        np.abs(np.asarray(updates["fc"]["kernel"])),
        cfg.init_lr / 5.0, rtol=1e-3,
    )


def test_epoch_lr_decay_sets_injected_rate(centers):
    """With epoch_lr_decay the lr is an opt_state leaf; apply_epoch_lr
    swaps it host-side and a compiled step consumes the new value (first
    Adam step displaces params by ~lr elementwise, so halving the lr must
    halve the update)."""
    cfg = get_config(
        "objectnet_bd",
        num_classes=4, feature_network="resnet18", N0=512, N1=8, N2=8,
        dict_size=len(centers), image_size=32, items_per_batch=1,
        optimizer_dtype="float32",
    )
    trainer = Trainer(cfg, dictionary=KMeansDictionary(cluster_centers=centers))
    state = trainer.init_state()
    rng = np.random.default_rng(0)
    batch = trainer.shard_batch(
        {
            "xdata": rng.integers(0, 256, (4, 32, 32, 3), np.uint8),
            "euler": rng.uniform(-60, 60, (4, 3)).astype(np.float32),
            "label": np.arange(4, dtype=np.int32),
        }
    )
    step = trainer.train_step_fn("main")
    # the compiled step donates its input state: snapshot before stepping
    b0 = np.asarray(state.params["bin_model"]["fc3"]["bias"]).copy()
    s1, _ = step(trainer.apply_epoch_lr(state, 0), batch)
    state2 = trainer.init_state()  # fresh identical state (same seed)
    s2, _ = step(trainer.apply_epoch_lr(state2, 19), batch)
    lr_ratio = (10 ** -(20 // 10)) / (1 + 20 % 10) / 0.5  # lambda(20)/lambda(1)
    d1 = np.asarray(s1.params["bin_model"]["fc3"]["bias"]) - b0
    d2 = np.asarray(s2.params["bin_model"]["fc3"]["bias"]) - b0
    # rtol dominated by f32 (p+u)-p cancellation at the 1e-6 update scale;
    # an unapplied lr would be 50x off
    np.testing.assert_allclose(d2, d1 * lr_ratio, rtol=5e-3, atol=1e-12)


def test_problem_geodesic_perfect_prediction_zero_loss(centers):
    """Decoded == target pose -> regression loss ~ 0."""
    p = make_problem("geodesic", centers)
    y = jnp.asarray(centers[:4], jnp.float32)  # poses exactly at atoms
    tg = p.targets(y)
    scores = jax.nn.one_hot(tg["bins"], 5) * 10.0
    residual = jnp.zeros((4, 3), jnp.float32)
    _, lr = p.main_losses((scores, residual), tg)
    assert float(lr) < 1e-2  # eps-clamped acos floor


def test_trainer_end_to_end_slice(dataset, centers, tmp_path):
    """The minimum end-to-end slice: warmup + main on synthetic data,
    eval returns a finite MedErr, checkpoint roundtrips."""
    cfg = get_config("geodesic_bd", **TINY)
    trainer = Trainer(
        cfg, dictionary=KMeansDictionary(cluster_centers=centers),
        workdir=tmp_path / "run",
    )
    real, render, test = _loaders(dataset, cfg)
    state = trainer.init_state()
    state = trainer.fit(state, real, render, test_loader=None)
    assert int(state.step) == 2 * (cfg.num_warmup_epochs + cfg.num_epochs)
    med = trainer.evaluate(state, test)
    assert np.isfinite(med) and 0 <= med <= 180
    # checkpoint roundtrip restores the exact state
    trainer.save_checkpoint(state, "test")
    restored = trainer.restore_checkpoint("test")
    jax.tree.map(
        lambda a, b: np.testing.assert_allclose(np.asarray(a), np.asarray(b)),
        jax.device_get(state.params), jax.device_get(restored.params),
    )
    assert int(restored.step) == int(state.step)


def test_trainer_loss_decreases_overfit(dataset, centers, tmp_path):
    """Overfit-a-batch: repeated steps on the same data reduce the loss."""
    cfg = get_config(
        "simple_bd", **{**TINY, "max_iterations": 1, "init_lr": 1e-3}
    )
    trainer = Trainer(cfg, dictionary=KMeansDictionary(cluster_centers=centers))
    real, render, _ = _loaders(dataset, cfg)
    batch = next(iter(real))
    batch = trainer.shard_batch(batch)
    state = trainer.init_state()
    step = trainer.train_step_fn("warmup")
    losses = []
    for _ in range(8):
        state, metrics = step(state, batch)
        losses.append(float(metrics["lc"]) + float(metrics["lr"]))
    assert losses[-1] < losses[0]


def test_one_vs_n_device_equivalence(dataset, centers):
    """A 3-step loss trajectory is identical on a 1-device and an 8-device
    mesh (params, optimizer, BN stats, and balance s all evolve equally)."""
    cfg = get_config("geodesic_bd", **TINY)
    dict_ = KMeansDictionary(cluster_centers=centers)
    real, _, _ = _loaders(dataset, cfg)
    batch = next(iter(real))  # 6 images; pad to 8 for the 8-way mesh
    batch = {
        k: np.concatenate([v, v[:2]]) for k, v in batch.items()
    }
    trajectories = {}
    for n_dev in (1, 8):
        mesh = make_mesh(jax.devices()[:n_dev])
        trainer = Trainer(cfg, dictionary=dict_, mesh=mesh)
        state = trainer.init_state()
        traj = []
        for _ in range(3):
            state, metrics = trainer.train_step_fn("main")(
                state, trainer.shard_batch(batch)
            )
            traj.append({k: float(v) for k, v in metrics.items()})
        trajectories[n_dev] = traj
    for s1, s8 in zip(trajectories[1], trajectories[8]):
        for k in s1:
            np.testing.assert_allclose(s1[k], s8[k], rtol=5e-4, atol=1e-5)


def test_restore_checkpoint_without_rng_field(dataset, centers, tmp_path):
    """Checkpoints saved before TrainState carried the augmentation rng
    still restore (migration: missing leaf -> fresh key)."""
    import orbax.checkpoint as ocp

    cfg = get_config("geodesic_bd", **TINY)
    trainer = Trainer(
        cfg, dictionary=KMeansDictionary(cluster_centers=centers),
        workdir=tmp_path / "run",
    )
    state = trainer.init_state()
    # simulate a pre-rng checkpoint: save the state as a dict missing 'rng'
    old = {
        f: jax.device_get(getattr(state, f))
        for f in ("step", "params", "batch_stats", "opt_state", "s")
    }
    path = (tmp_path / "run" / "checkpoints" / "old").absolute()
    with ocp.StandardCheckpointer() as ckptr:
        ckptr.save(path, old, force=True)
    restored = trainer.restore_checkpoint("old")
    jax.tree.map(
        lambda a, b: np.testing.assert_array_equal(np.asarray(a), np.asarray(b)),
        jax.device_get(restored.params), old["params"],
    )
    assert restored.rng is not None


def test_bf16_optimizer_dtype_trains():
    """optimizer_dtype='bfloat16' stores Adam's mu in bf16 and still
    produces finite, decreasing-ish losses."""
    import jax
    import jax.numpy as jnp

    from multi_modal_regression_tpu.train.presets import (
        build_optimizer,
        get_config,
    )

    cfg = get_config("geodesic_bd", optimizer_dtype="bfloat16")
    tx = build_optimizer(cfg)
    params = {"w": jnp.ones((8, 8))}
    state = tx.init(params)
    mu = state[0].mu["w"]
    assert mu.dtype == jnp.bfloat16
    g = {"w": jnp.full((8, 8), 0.1)}
    for _ in range(3):
        updates, state = tx.update(g, state, params)
        params = {"w": params["w"] + updates["w"]}
    assert bool(jnp.isfinite(params["w"]).all())


def test_preprocess_emits_compute_dtype_both_paths():
    """_preprocess with a compute dtype must emit bf16 directly on both the
    fused-normalize and the device-resize path (no f32 write + cast pass)."""
    from multi_modal_regression_tpu.train.steps import _preprocess

    batch = {"xdata": jnp.zeros((2, 16, 16, 3), jnp.uint8)}
    assert _preprocess(batch, None, jnp.bfloat16).dtype == jnp.bfloat16
    assert _preprocess(batch, 8, jnp.bfloat16).dtype == jnp.bfloat16
    assert _preprocess(batch, None, None).dtype == jnp.float32


def test_evaluator_step_uses_compute_dtype(dataset, centers, monkeypatch):
    """The snapshot evaluator builds its fine-tune step with the SAME
    compute_dtype the Trainer uses (round-2 regression: it dropped it and
    re-paid the f32 normalize)."""
    from multi_modal_regression_tpu.train import evaluator as ev_mod
    from multi_modal_regression_tpu.train import SnapshotEnsembleEvaluator

    cfg = get_config("geodesic_bd", **TINY, compute_dtype="bfloat16")
    trainer = Trainer(cfg, dictionary=KMeansDictionary(
        cluster_centers=centers))
    captured = {}
    orig = ev_mod.make_train_step

    def spy(*args, **kwargs):
        captured.update(kwargs)
        return orig(*args, **kwargs)

    monkeypatch.setattr(ev_mod, "make_train_step", spy)
    ev = SnapshotEnsembleEvaluator(trainer, cycle_len=4)
    real, render, test = _loaders(dataset, cfg)
    state = trainer.init_state()
    ev.run(state, real, render, test, num_epochs=1)
    assert captured.get("compute_dtype") == jnp.bfloat16


def test_evaluator_rejects_mismatched_dual_stream_halves(dataset, centers):
    """The snapshot evaluator compiles the dual-stream (per-stream BN) step
    whenever a render loader is present, so it must enforce the same
    [real*n, render*n] batch layout Trainer.run_epoch does — a mismatched
    loader pair would silently mix render rows into the real BN stream."""
    from multi_modal_regression_tpu.train import SnapshotEnsembleEvaluator

    cfg = get_config("geodesic_bd", **TINY)
    trainer = Trainer(cfg, dictionary=KMeansDictionary(
        cluster_centers=centers))
    real, _, test = _loaders(dataset, cfg)
    render_index = ClassBalancedIndex(str(dataset), "render", classes=CLASSES)
    render_bigger = BalancedLoader(
        render_index, cfg.items_per_batch + 1, cfg.image_size, num_workers=2
    )
    ev = SnapshotEnsembleEvaluator(trainer, cycle_len=4)
    state = trainer.init_state()
    with pytest.raises(ValueError, match="equal real/render halves"):
        ev.run(state, real, render_bigger, test, num_epochs=1)


@pytest.mark.parametrize("mode", ["block", "stage", "conv", "dots", "nothing"])
def test_remat_modes_match_no_remat(dataset, centers, mode):
    """jax.checkpoint is semantics-exact: every remat policy must produce
    the same loss and updated params as the unremat step (same program,
    different schedule)."""
    from multi_modal_regression_tpu.parallel.mesh import make_mesh

    rng = np.random.default_rng(7)
    batch = {
        "xdata": rng.integers(0, 256, (12, 32, 32, 3), np.uint8),
        "euler": rng.uniform(-90, 90, (12, 3)).astype(np.float32),
        "label": (np.arange(12) % 3).astype(np.int32),
    }
    results = {}
    for remat in (None, mode):
        cfg = get_config("geodesic_bd", **TINY, remat=remat)
        trainer = Trainer(
            cfg, dictionary=KMeansDictionary(cluster_centers=centers),
            mesh=make_mesh(jax.devices()[:1]),
        )
        state = trainer.init_state(0)
        step = trainer.train_step_fn("main")
        state, metrics = step(state, trainer.shard_batch(dict(batch)))
        results[remat] = (
            float(metrics["loss"]),
            np.asarray(
                jax.tree_util.tree_leaves(state.params)[0], np.float32
            ),
        )
    loss_ref, leaf_ref = results[None]
    loss_got, leaf_got = results[mode]
    np.testing.assert_allclose(loss_got, loss_ref, rtol=1e-5)
    np.testing.assert_allclose(leaf_got, leaf_ref, rtol=1e-4, atol=1e-6)


def test_optimizer_dtype_default_is_bf16_and_f32_optin():
    """Round-3 default flip: bf16 Adam mu (measured faster, trajectory
    unharmed — BASELINE.md); float32 stays the reference-exact opt-in."""
    from multi_modal_regression_tpu.train.presets import (
        build_optimizer,
        get_config,
    )

    assert get_config("geodesic_bd").optimizer_dtype == "bfloat16"
    tx = build_optimizer(get_config("geodesic_bd"))
    params = {"w": jnp.ones((4, 4))}
    assert tx.init(params)[0].mu["w"].dtype == jnp.bfloat16
    tx32 = build_optimizer(get_config("geodesic_bd", optimizer_dtype="float32"))
    assert tx32.init(params)[0].mu["w"].dtype == jnp.float32


def test_remat_exact_on_multires(centers):
    """remat wraps the loss fn generically — verify exactness on the
    multires model too (argmax bin-select + per-bin delta bank, the
    heaviest control-flow path)."""
    from multi_modal_regression_tpu.parallel.mesh import make_mesh

    rng = np.random.default_rng(9)
    batch = {
        "xdata": rng.integers(0, 256, (12, 32, 32, 3), np.uint8),
        "euler": rng.uniform(-90, 90, (12, 3)).astype(np.float32),
        "label": (np.arange(12) % 3).astype(np.int32),
    }
    losses = {}
    for remat in (None, "block"):
        cfg = get_config("geodesic_bd_multires", **TINY, remat=remat)
        trainer = Trainer(
            cfg, dictionary=KMeansDictionary(cluster_centers=centers),
            mesh=make_mesh(jax.devices()[:1]),
        )
        state = trainer.init_state(0)
        state, metrics = trainer.train_step_fn("main")(
            state, trainer.shard_batch(dict(batch))
        )
        losses[remat] = float(metrics["loss"])
    np.testing.assert_allclose(losses["block"], losses[None], rtol=1e-5)


def test_lr_scaling_rules():
    """scaled_lr: linear = k*init_lr, sqrt = sqrt(k)*init_lr, none = init_lr
    (k = items_per_batch / lr_scaling_base_items)."""
    from multi_modal_regression_tpu.train.presets import scaled_lr

    cfg = get_config("geodesic_bd", **{**TINY, "items_per_batch": 16})
    assert scaled_lr(cfg) == cfg.init_lr
    lin = dataclasses.replace(cfg, lr_scaling="linear")
    np.testing.assert_allclose(scaled_lr(lin), cfg.init_lr * 2.0)
    sq = dataclasses.replace(cfg, lr_scaling="sqrt")
    np.testing.assert_allclose(scaled_lr(sq), cfg.init_lr * np.sqrt(2.0))
    with pytest.raises(ValueError):
        scaled_lr(dataclasses.replace(cfg, lr_scaling="bogus"))


def test_frozen_bn_step(dataset, centers):
    """frozen_bn=True: params update, batch_stats do NOT, and the loss
    equals one computed with an eval-mode forward (running stats)."""
    cfg = get_config("geodesic_bd", **{**TINY, "frozen_bn": True})
    trainer = Trainer(cfg, dictionary=KMeansDictionary(cluster_centers=centers))
    real, _, _ = _loaders(dataset, cfg)
    batch = trainer.shard_batch(next(iter(real)))
    state = trainer.init_state()
    bs_before = jax.device_get(state.batch_stats)
    p_before = jax.device_get(state.params)

    # expected loss: eval-mode forward + the same loss/balance math
    from multi_modal_regression_tpu.data.targets import euler_to_pose
    from multi_modal_regression_tpu.losses.self_balance import self_balanced
    from multi_modal_regression_tpu.ops.preprocess import (
        normalize_images_pallas,
    )

    images = normalize_images_pallas(batch["xdata"])
    y = euler_to_pose(batch["euler"], trainer.problem.ydata_type)
    tg = dict(trainer.problem.targets(y))
    tg["class_label"] = batch["label"]
    out = trainer.apply_fn(
        {"params": state.params, "batch_stats": state.batch_stats},
        images, batch["label"], False,
    )
    lc, lr = trainer.problem.main_losses(out, tg)
    want_loss, _ = self_balanced(lc, lr, state.s, mode="main")

    state2, metrics = trainer.train_step_fn("main")(state, batch)
    np.testing.assert_allclose(
        float(metrics["loss"]), float(want_loss), rtol=1e-5
    )
    bs_after = jax.device_get(state2.batch_stats)
    jax.tree.map(
        lambda a, b: np.testing.assert_array_equal(np.asarray(a), np.asarray(b)),
        bs_before, bs_after,
    )
    # params DID update
    p_after = jax.device_get(state2.params)
    moved = any(
        not np.allclose(np.asarray(a), np.asarray(b))
        for a, b in zip(jax.tree.leaves(p_before), jax.tree.leaves(p_after))
    )
    assert moved


def test_async_checkpoint_matches_sync(dataset, centers, tmp_path):
    """checkpoint_async (default on): the background write commits an
    identical checkpoint, rapid successive saves serialize (last one
    wins), and wait_for_checkpoints makes completion observable."""
    states = {}
    for mode, async_on in (("async", True), ("sync", False)):
        cfg = get_config("geodesic_bd", **TINY).replace(
            checkpoint_async=async_on
        )
        trainer = Trainer(
            cfg, dictionary=KMeansDictionary(cluster_centers=centers),
            workdir=tmp_path / mode,
        )
        real, render, _ = _loaders(dataset, cfg)
        state = trainer.init_state()
        step = trainer.train_step_fn("main")
        for batch in real:
            b = trainer.shard_batch(batch)
            trainer.save_checkpoint(state)  # save while stepping: the
            state, _ = step(state, b)       # donated update must not
            break                           # corrupt the in-flight save
        trainer.save_checkpoint(state)      # rapid second save
        trainer.wait_for_checkpoints()
        restored = trainer.restore_checkpoint()
        assert int(restored.step) == int(state.step)  # last save won
        states[mode] = jax.device_get(restored.params)
    jax.tree.map(
        lambda a, b: np.testing.assert_array_equal(
            np.asarray(a), np.asarray(b)
        ),
        states["async"], states["sync"],
    )


def test_big_batch_matched_steps_converges(tmp_path_factory):
    """The validated scale-out recipe (SCALING.md round 4): growing the
    global batch 8x with UNSCALED Adam LR and matched STEPS converges at
    least as well as the small batch — the dp scale-out semantics for
    data-rich training. (The refuted matched-epochs LR rules are recorded
    in benchmarks/bench_lr_scaling.py / SCALING.md.)"""
    root = generate_pose_dataset(
        tmp_path_factory.mktemp("posedata"), classes=CLASSES,
        images_per_class=24, image_size=32, seed=11, pattern="pose",
    )
    rng = np.random.default_rng(4)
    centers = (0.8 * rng.standard_normal((8, 3))).astype(np.float32)
    meds = {}
    for ipb in (2, 16):
        cfg = get_config(
            "geodesic_bd", **{
                **TINY, "items_per_batch": ipb, "dict_size": 8,
                "init_lr": 1e-3, "eval_batch": 24,
            }
        )
        trainer = Trainer(
            cfg, dictionary=KMeansDictionary(cluster_centers=centers)
        )
        real = BalancedLoader(
            ClassBalancedIndex(str(root), "real", classes=CLASSES),
            ipb, 32, num_workers=4, seed=0,
        )
        test = TestLoader(
            FlatTestIndex(str(root), classes=CLASSES), 24, 32, num_workers=4
        )
        batches = []
        for b in real:
            batches.append(trainer.shard_batch(b))
            if len(batches) >= 4:
                break
        state = trainer.init_state()
        step = trainer.train_step_fn("main")
        for i in range(40):  # matched steps, unscaled LR
            state, _ = step(state, batches[i % len(batches)])
        meds[ipb] = trainer.evaluate(state, test)
    # the big batch saw 8x the data in the same steps: it must be at
    # least as converged (generous band for eval noise at this scale)
    assert meds[16] <= meds[2] + 10.0, meds
    assert meds[16] < 110.0, meds  # and learning actually happened


# ---------------------------------------------------------------------------
# preset defaults pinned against the reference scripts' own argparse defaults
# ---------------------------------------------------------------------------

# preset -> the reference script whose defaults it must reproduce
_PRESET_SCRIPTS = {
    "simple_bd": "learnSimpleBDModel.py",
    "simple_bd_rene": "learnSimpleBDModel_rene.py",
    "euclidean_bd_rene": "learnEuclideanBDModel_rene.py",
    "geodesic_bd": "learnGeodesicBDModel.py",
    "geodesic_bd_multires": "learnGeodesicBDModel.py",
    "geodesic_bd_quaternion": "learnGeodesicBDModel_quaternion.py",
    "euclidean_bd": "learnEuclideanBDModel.py",
    "laplacian_bd": "learnLaplacianBDModel.py",
    "log_euclidean_bd": "learnLogEuclideanModel.py",
    "riemannian_bd": "learnRiemannianBDModel.py",
    "probabilistic_bd": "learnProbabilisticBDModel.py",
    "probabilistic_bd_multires": "learnProbabilisticBDModel.py",
    "classification": "learnClassificationModel.py",
    "geodesic_regression": "learnGeodesicRegressionModel.py",
    "geodesic_regression_quaternion": "learnGeodesicRegression_quaternion.py",
    "independent_regression": "learnIndependentRegressionModel.py",
    "independent_bd": "learnIndependentBDModel.py",
    "rendered_bd": "learnRenderedBDModel.py",
    "joint_cat_pose_top1": "learnJointCatPoseModel_top1.py",
    "joint_cat_pose_top1_new": "learnJointCatPoseModel_top1_new.py",
    "joint_cat_pose_weighted": "learnJointCatPoseModel_weighted.py",
    "joint_cat_pose2_top1": "learnJointCatPoseModel2_top1.py",
    "joint_cat_pose2_weighted": "learnJointCatPoseModel2_weighted.py",
    "joint_cat_pose3_top1": "learnJointCatPoseModel3_top1.py",
    "joint_cat_pose3_weighted": "learnJointCatPoseModel3_weighted.py",
    "elhoseiny_bd": "learnElhoseinyBDModel.py",
    "elhoseiny_regression": "learnElhoseinyRegressionModel.py",
    "categorization": "learnCategorizationModel.py",
    "cat_given_pose": "learnCatGivenPoseModel.py",
    "cat_given_pose3": "learnCatGivenPoseModel3.py",
    "objectnet_quat": "learnObjectnetModel.py",
    "objectnet_bd": "learnObjectnetBDModel.py",
    "objectnet_regression": "learnObjectnetRegressionModel.py",
    "objectnet_classification": "learnObjectnetClassificationModel.py",
    "ablation_geodesic_bd": "ablationGeodesicBDModel.py",
    "ablation_xbd": "ablationXBDModel.py",
    "ablation_gbd_augmentation": "ablationGBDAugmentation.py",
    "ablation_c0": "ablationDictionarySizeC0.py",
}

# presets whose dict_size deliberately diverges from the script's --dict_size
# argparse default, each for a documented runnability reason (presets.py):
#   objectnet_quat          — the analytic 16-atom dictionary is hardcoded
#                             (learnObjectnetModel.py:60-66); --dict_size is
#                             never used to build it
#   objectnet_bd_multires   — OneDeltaPerBinModel(num_classes) keeps the ctor
#                             default 16 heads (learnObjectnetBDModel.py:83),
#                             so only a 16-atom dictionary can run
#   geodesic_bd_multires / probabilistic_bd_multires — same script/flag as
#                             their base preset (checked via the base row)
_DICT_SIZE_EXEMPT = {
    "objectnet_quat",
    "objectnet_bd_multires",
}


def _reference_defaults(script):
    """num_epochs / init_lr / dict_size defaults as the script declares them
    (argparse default=... or a module-level constant)."""
    import os
    import re

    with open(os.path.join("/root/reference", script)) as f:
        text = f.read()
    out = {}
    for key, pat in (
        ("num_epochs", r"num_epochs', type=int, default=(\d+)"),
        ("init_lr", r"init_lr', type=float, default=([0-9eE.+-]+)"),
        ("dict_size", r"dict_size', type=int, default=(\d+)"),
    ):
        m = re.search(pat, text) or re.search(
            rf"^{key} = ([0-9eE.+-]+)\s*$", text, re.M
        )
        if m:
            out[key] = float(m.group(1))
    return out


@pytest.mark.skipif(
    not __import__("os").path.isdir("/root/reference"),
    reason="reference repo not mounted",
)
def test_preset_defaults_match_reference_argparse_defaults():
    """Every training preset's num_epochs / init_lr / dict_size defaults ==
    the corresponding reference script's own argparse defaults (parsed from
    the reference at test time, not pinned by hand). Catches silently-wrong
    run lengths: the joint scripts default to 50 epochs (v2: 20, and v2 is
    the only family at init_lr=1e-5 — learnJointCatPoseModel2_top1.py:35,38),
    the ObjectNet scripts to 10, while the BD family runs 3."""
    for preset, script in _PRESET_SCRIPTS.items():
        ref = _reference_defaults(script)
        cfg = get_config(preset)
        assert ref, f"{script}: no defaults parsed"
        if "num_epochs" in ref:
            assert cfg.num_epochs == int(ref["num_epochs"]), (
                f"{preset}: num_epochs {cfg.num_epochs} != "
                f"{script}'s default {ref['num_epochs']}"
            )
        if "init_lr" in ref:
            assert cfg.init_lr == pytest.approx(ref["init_lr"]), (
                f"{preset}: init_lr {cfg.init_lr} != "
                f"{script}'s default {ref['init_lr']}"
            )
        if "dict_size" in ref and preset not in _DICT_SIZE_EXEMPT:
            assert cfg.dict_size == int(ref["dict_size"]), (
                f"{preset}: dict_size {cfg.dict_size} != "
                f"{script}'s default {ref['dict_size']}"
            )
    # the evaluate protocol's fine-tune length (all evaluate* scripts)
    ev = _reference_defaults("evaluateGeodesicBDModel.py")
    assert get_config("geodesic_bd").eval_num_epochs == int(ev["num_epochs"])
