"""Experiment presets: one structured config per reference training script.

The reference spreads ~30 near-identical argparse scripts over the repo
(learn*.py); here each is a named preset of ONE config dataclass preserving
the reference flag names/defaults (dict_size=200, N0/N1/N2/N3 =
2048/1000/500/100, init_lr=1e-4, num_epochs=3 —
learnGeodesicBDModel.py:28-45). `build(...)` materializes the model,
problem, optimizer, and apply-fn adaptor for the Trainer.
"""

from __future__ import annotations

import dataclasses
from typing import Any

import jax
import jax.numpy as jnp
import numpy as np
import optax

from multi_modal_regression_tpu.models import (
    CategorizationModel,
    ElhoseinyBDModel,
    ElhoseinyRegressionModel,
    IndependentBDModel,
    IndependentRegressionModel,
    JointCatPoseBDModel,
    JointCatPoseBDModel2,
    JointCatPoseRegModel,
    LabelConcatBDModel,
    LabelConcatClassificationModel,
    LabelConcatDeltaPerBinModel,
    LabelConcatRegressionModel,
    OneBinDeltaModel,
    OneDeltaPerBinModel,
    PerClassClassificationModel,
    PerClassRegressionModel,
    ProbabilisticOneDeltaPerBinModel,
)
from multi_modal_regression_tpu.train.joint_problems import make_joint_problem
from multi_modal_regression_tpu.train.problems import Problem, make_problem

JOINT_PROBLEMS = (
    "joint_bd", "joint_reg", "elhoseiny_bd", "elhoseiny_reg", "category"
)


@dataclasses.dataclass
class ExperimentConfig:
    """One training experiment (a reference learn*.py script)."""

    preset: str = "geodesic_bd"
    # model
    model_kind: str = "one_bin_delta"  # see _MODEL_KINDS
    feature_network: str = "resnet50"
    feature_layer: str = "layer4"
    num_classes: int = 12
    dict_size: int = 200
    N0: int = 2048
    N1: int = 1000
    N2: int = 500
    N3: int = 100
    ndim: int = 3
    nonlinearity: str = "pi_tanh"  # regression models
    multires: bool = False
    # problem / loss
    problem: str = "geodesic"
    self_balance: bool = True  # False -> fixed loss Lc + alpha * Lr
    # most two-phase scripts reset s=0 between warmup and main
    # (learnGeodesicBDModel.py:240); learnRiemannianBDModel.py is the one
    # self-balanced script that CARRIES the warmup-final s into the main
    # phase (its only assignment is the module-level init at :133)
    reset_s_between_phases: bool = True
    alpha: float = 1.0  # fixed main-phase Lr weight when self-balance is off
    warmup_alpha: float = 1.0  # fixed warmup-phase Lr weight
    # RBF soft-bin width; None -> derived from the dictionary geometry via
    # get_gamma (the ablationXBDModel.py:61-62 protocol)
    gamma: float | None = 10.0
    mixing: str = "top1"  # joint models: 'top1' | 'joint_top1' | 'top1_st' | 'weighted'
    # restrict training to these top-level param collections (None = all),
    # e.g. ("fc",) for learnCatGivenPoseModel.py:108-126's frozen oracle
    train_only: tuple[str, ...] | None = None
    # restrict train-mode BatchNorm to these top-level modules; everything
    # else runs on running stats even in the train step (the _rene scripts'
    # model.eval() + res_models.train() mix, learnSimpleBDModel_rene.py:
    # 133,148). None = the ordinary global train/eval switch.
    bn_train_only: tuple[str, ...] | None = None
    # when training from TWO loaders (real + render), run the reference's
    # exact two-forward protocol: per-stream BatchNorm batch statistics and
    # two sequential running-stat EMA updates per step
    # (learnGeodesicBDModel.py:116-121). Single-loader runs are unaffected.
    # False = one forward over the concatenated batch (shared BN stats).
    bn_per_stream: bool = True
    # execution strategy for bn_per_stream (same semantics either way):
    # True = one vmapped forward over the stream axis with the two EMA
    # updates composed algebraically (full-batch conv pipelines — measured
    # faster, steps._fused_dual_stream_apply); False = the literal two
    # sequential half-batch forwards. Identical up to ~1-ulp EMA rounding.
    bn_stream_fused: bool = True
    # the regression/classification/ablation scripts compute each stream's
    # loss separately and SUM them (loss_real + loss_render,
    # learnGeodesicRegressionModel.py:138) — on equal halves exactly a
    # factor-2 scale vs the concat mean; applied by the dual-stream step
    loss_stream_sum: bool = False
    # optimization (reference defaults: learnGeodesicBDModel.py:41-42,96)
    init_lr: float = 1e-4
    # per-epoch LR decay applied before each MAIN epoch, mirroring the
    # reference's scheduler.step()-before-training() pattern (main epoch e
    # runs at init_lr * factor(e+1); warm-up/pre-loop passes at factor(0)=1).
    # 'objectnet' = LambdaLR 10^-(ep//10)/(1+ep%10)
    # (learnObjectnetBDModel.py:87,190; learnObjectnetModel.py:134,238);
    # 'step' = StepLR(step_size=1, gamma=0.1) — the regression family,
    # classifiers, independent/rendered/probabilistic BD, and all four
    # ablation scripts (e.g. learnGeodesicRegressionModel.py:114,234);
    # 'inv' = LambdaLR 1/(1+ep) — the joint/categorization family
    # (learnJointCatPoseModel2_top1.py:142-148, learnCategorizationModel.py:69).
    # None = constant lr (the two-phase BD scripts comment theirs out,
    # learnGeodesicBDModel.py:97,243).
    epoch_lr_decay: str | None = None
    # global-batch scale-out recipe (SCALING.md): growing items_per_batch
    # k-fold over lr_scaling_base_items (8 = the reference 96-image step)
    # changes optimization semantics — 'linear' scales init_lr by k
    # (Goyal et al.'s rule; convergence-validated on the 8-device mesh,
    # tests/test_train.py), 'sqrt' by sqrt(k), 'none' leaves init_lr
    # untouched. BN statistics stay PER-DEVICE either way (the per-shard
    # batch is what each BatchNorm sees; dp replicas average gradients,
    # not statistics).
    lr_scaling: str = "none"
    lr_scaling_base_items: int = 8
    num_warmup_epochs: int = 1
    num_epochs: int = 3
    items_per_batch: int = 8  # images/step = items_per_batch * num_classes
    image_size: int = 224
    # on-device resize fast path: loaders ship raw images at this size and
    # the compiled step resizes to image_size via MXU matmuls (ops.augment);
    # None = host (PIL) resize in the loaders
    device_resize_from: int | None = None
    # per-sample random horizontal flips (+ the (-az, el, -ct) pose
    # transform) inside the train step — the train-time form of the
    # reference's offline flipped copies
    train_flip: bool = False
    eval_batch: int = 96
    max_iterations: int | None = None  # cap steps/epoch (debug)
    eval_every: int = 1000
    seed: int = 0
    compute_dtype: str = "float32"  # 'bfloat16' for the TPU fast path
    # 'bfloat16' (default) stores Adam's first moment in bf16 (see
    # build_optimizer) — measured round 3: +0.7% at 224px (+23% at 64px
    # where the optimizer pass dominates) with an unharmed MedErr
    # trajectory (BASELINE.md); 'float32' matches the reference's
    # torch.optim.Adam bit-for-bit
    optimizer_dtype: str = "bfloat16"
    # fused conv+BN training path for bottleneck ResNets (ops.fused_conv_bn):
    # 'auto' = Pallas kernels when on TPU with bfloat16 compute, else off;
    # 'pallas'|'xla'|'interpret' force an impl; None/'off' = flax modules
    fused_conv_bn: str | None = "auto"
    # fused stem bn+relu+maxpool kernel (ops.stem_pool); 'auto' = on for
    # single-chip TPU + bfloat16
    stem_pool: str | None = "auto"
    # rematerialization policy for the train step's backward pass
    # (train/remat.py: none|block|stage|conv|dots|nothing) — trades idle
    # MXU FLOPs for the saved-activation HBM traffic the step is bound by
    remat: str | None = None
    # SEMANTICS-CHANGING fast mode: train with BatchNorm in eval mode
    # (running stats; no batch-stat computation, update, or gradient
    # routing). torch precedent: the _rene scripts fine-tune with
    # model.eval() active (learnSimpleBDModel_rene.py:133). Intended for
    # fine-tuning converged models (snapshot-ensemble evaluation);
    # measured on-chip in BASELINE.md round 4
    frozen_bn: bool = False
    # background-thread checkpoint writes (single-process runs): the D2H
    # fetch stays synchronous (the train step donates its state buffers),
    # the orbax serialization + disk IO leaves the training loop. Saves
    # remain atomic; Trainer.wait_for_checkpoints() observes completion.
    # Multi-host saves are always synchronous (orbax global barrier).
    checkpoint_async: bool = True
    tensorboard: bool = False  # also emit TB scalars (utils.metrics_writer)
    # snapshot-ensemble evaluation (helperFunctions.py:64,112-118)
    eval_alpha1: float = 1e-6
    eval_alpha2: float = 1e-8
    eval_num_epochs: int = 9

    def replace(self, **kw) -> "ExperimentConfig":
        return dataclasses.replace(self, **kw)


def _model_takes_label(kind: str) -> bool:
    return kind in (
        "one_bin_delta", "one_delta_per_bin", "probabilistic",
        "per_class_regression", "per_class_classification",
        "labelconcat_bd", "labelconcat_delta_per_bin",
        "labelconcat_regression", "labelconcat_classification",
    )


def resolve_compute_dtype(name: str):
    """compute_dtype config string -> jnp dtype, or None for plain float32
    (callers that pass `None` downstream mean "leave the f32 default").
    'float64' exists for the x64 dynamics-parity harness
    (tests/test_torch_dynamics.py) — requires jax_enable_x64. One shared
    mapping so model build, train/eval steps, and the snapshot evaluator
    can never drift to different dtypes."""
    return {"bfloat16": jnp.bfloat16, "float64": jnp.float64}.get(name)


def build_model(cfg: ExperimentConfig):
    from multi_modal_regression_tpu.ops.fused_conv_bn import resolve_impl
    from multi_modal_regression_tpu.ops.stem_pool import resolve_stem_impl

    dtype = resolve_compute_dtype(cfg.compute_dtype) or jnp.float32
    common = dict(
        num_classes=cfg.num_classes, N0=cfg.N0, N1=cfg.N1, N2=cfg.N2,
        feature_network=cfg.feature_network, feature_layer=cfg.feature_layer,
        dtype=dtype,
    )
    fused = resolve_impl(cfg.fused_conv_bn, cfg.compute_dtype)
    stem = resolve_stem_impl(cfg.stem_pool, cfg.compute_dtype)
    k = cfg.model_kind
    if k == "one_bin_delta":
        return OneBinDeltaModel(
            **common, num_clusters=cfg.dict_size, ndim=cfg.ndim,
            fused_bn=fused, stem_pool=stem,
            bn_train_scope=cfg.bn_train_only,
        )
    if cfg.bn_train_only is not None:
        raise ValueError(
            "bn_train_only is only supported for model_kind 'one_bin_delta' "
            "(the _rene fine-tune scripts)"
        )
    if k == "one_delta_per_bin":
        return OneDeltaPerBinModel(
            **common, num_clusters=cfg.dict_size, N3=cfg.N3, ndim=cfg.ndim,
            fused_bn=fused, stem_pool=stem,
        )
    if k == "probabilistic":
        return ProbabilisticOneDeltaPerBinModel(
            **common, num_clusters=cfg.dict_size, N3=cfg.N3, ndim=cfg.ndim,
            fused_bn=fused, stem_pool=stem,
        )
    if k == "per_class_regression":
        return PerClassRegressionModel(
            **common, ndim=cfg.ndim, nonlinearity=cfg.nonlinearity
        )
    if k == "per_class_classification":
        return PerClassClassificationModel(**common, num_clusters=cfg.dict_size)
    if k == "independent_regression":
        return IndependentRegressionModel(
            **common, ndim=cfg.ndim, nonlinearity=cfg.nonlinearity
        )
    if k == "independent_bd":
        return IndependentBDModel(
            **common, num_clusters=cfg.dict_size, N3=cfg.N3, ndim=cfg.ndim
        )
    if k == "joint_bd_v1":
        return JointCatPoseBDModel(
            **common, num_clusters=cfg.dict_size, N3=cfg.N3, ndim=cfg.ndim,
            multires=cfg.multires, mixing=cfg.mixing,
        )
    if k == "joint_bd_v2":
        v2 = dict(common)
        v2.pop("feature_network")
        v2.pop("feature_layer")
        return JointCatPoseBDModel2(
            **v2, arch=cfg.feature_network, num_clusters=cfg.dict_size,
            N3=cfg.N3, ndim=cfg.ndim, multires=cfg.multires, mixing=cfg.mixing,
        )
    if k == "joint_reg_v3":
        return JointCatPoseRegModel(
            **common, ndim=cfg.ndim, mixing=cfg.mixing,
            nonlinearity=cfg.nonlinearity,
        )
    if k == "elhoseiny_bd":
        return ElhoseinyBDModel(
            **common, num_clusters=cfg.dict_size, N3=cfg.N3, ndim=cfg.ndim
        )
    if k == "elhoseiny_reg":
        return ElhoseinyRegressionModel(
            **common, ndim=cfg.ndim, nonlinearity=cfg.nonlinearity
        )
    if k == "categorization":
        return CategorizationModel(**common)
    if k == "labelconcat_bd":
        return LabelConcatBDModel(
            **common, num_clusters=cfg.dict_size, ndim=cfg.ndim
        )
    if k == "labelconcat_delta_per_bin":
        return LabelConcatDeltaPerBinModel(
            **common, num_clusters=cfg.dict_size, N3=cfg.N3, ndim=cfg.ndim
        )
    if k == "labelconcat_regression":
        return LabelConcatRegressionModel(
            **common, ndim=cfg.ndim, nonlinearity=cfg.nonlinearity
        )
    if k == "labelconcat_classification":
        return LabelConcatClassificationModel(
            **common, num_clusters=cfg.dict_size
        )
    raise ValueError(f"unknown model_kind {cfg.model_kind!r}")


def make_apply_fn(model, cfg: ExperimentConfig):
    """Uniform (variables, images, labels, train) -> outputs adaptor."""
    takes_label = _model_takes_label(cfg.model_kind)

    def apply_fn(variables, images, labels, train):
        args = (images, labels) if takes_label else (images,)
        if train:
            return model.apply(
                variables, *args, train=True, mutable=["batch_stats"]
            )
        return model.apply(variables, *args, train=False)

    return apply_fn


def build_problem(cfg: ExperimentConfig, dictionary: Any = None) -> Problem:
    """dictionary: KMeansDictionary / GMMDictionary / raw (K, D) centers."""
    centers = None
    gmm_kw: dict = {}
    if dictionary is not None:
        if hasattr(dictionary, "means"):  # GMM
            gmm_kw = dict(
                gmm_means=dictionary.means,
                gmm_covariances=dictionary.covariances,
                gmm_weights=dictionary.weights,
            )
            centers = dictionary.means
        elif hasattr(dictionary, "cluster_centers"):
            centers = dictionary.cluster_centers
        else:
            centers = np.asarray(dictionary)
    if cfg.problem in JOINT_PROBLEMS:
        # variant 2 computes the category CE on ALL images; 1/3 on real only
        # (learnJointCatPoseModel2_weighted.py:171 vs _top1.py:176)
        problem = make_joint_problem(
            cfg.problem, centers,
            cat_on_real_only=cfg.model_kind != "joint_bd_v2",
        )
    else:
        gamma = cfg.gamma
        if gamma is None and centers is not None:
            from multi_modal_regression_tpu.dictionary import get_gamma

            gamma = get_gamma(centers)
        problem = make_problem(
            cfg.problem, centers,
            gamma=gamma if gamma is not None else 10.0,
            multires=cfg.multires, **gmm_kw,
        )
    if not cfg.self_balance:
        problem = dataclasses.replace(
            problem, warmup_balance=None, main_balance=None
        )
    return problem


def scaled_lr(cfg: ExperimentConfig) -> float:
    """init_lr adjusted by the global-batch scaling rule (cfg.lr_scaling):
    k = items_per_batch / lr_scaling_base_items; 'linear' -> k * init_lr,
    'sqrt' -> sqrt(k) * init_lr, 'none' -> init_lr."""
    if cfg.lr_scaling == "none":
        return cfg.init_lr
    k = cfg.items_per_batch / cfg.lr_scaling_base_items
    if cfg.lr_scaling == "linear":
        return cfg.init_lr * k
    if cfg.lr_scaling == "sqrt":
        return cfg.init_lr * float(np.sqrt(k))
    raise ValueError(f"unknown lr_scaling {cfg.lr_scaling!r}")


def build_optimizer(cfg: ExperimentConfig) -> optax.GradientTransformation:
    # optimizer_dtype='bfloat16' (default) stores Adam's first moment in
    # bf16 (optax mu_dtype), cutting ~0.7 GB/step of optimizer-state HBM
    # traffic on the 88 M-param flagship; the update math still runs in
    # f32. 'float32' matches the reference's torch.optim.Adam exactly.
    mu_dtype = (
        jnp.bfloat16 if cfg.optimizer_dtype == "bfloat16" else None
    )

    def masked(tx):
        if cfg.train_only is None:
            return tx
        # freeze everything outside the named top-level param collections
        # (learnCatGivenPoseModel.py:108-126 trains only the new fc)
        keep = set(cfg.train_only)

        def label_fn(params):
            return {
                k: jax.tree.map(lambda _: "train" if k in keep else "freeze", v)
                for k, v in params.items()
            }

        return optax.multi_transform(
            {"train": tx, "freeze": optax.set_to_zero()}, label_fn
        )

    if cfg.epoch_lr_decay is not None:
        from multi_modal_regression_tpu.train.schedules import (
            EPOCH_LR_FACTORS,
        )

        if cfg.epoch_lr_decay not in EPOCH_LR_FACTORS:
            raise ValueError(
                f"unknown epoch_lr_decay {cfg.epoch_lr_decay!r}; "
                f"available: {sorted(EPOCH_LR_FACTORS)}"
            )
        # the learning rate becomes an opt_state leaf
        # (InjectHyperparamsState.hyperparams) so Trainer.fit can set the
        # per-epoch value between compiled steps without touching the Adam
        # moments or recompiling (the steps close over tx, not the lr).
        # train_only masking composes INSIDE the injection
        # (learnCatGivenPoseModel.py freezes the oracle AND steps its
        # LambdaLR, :111-127,204).
        return optax.inject_hyperparams(
            lambda learning_rate: masked(
                optax.adam(learning_rate, mu_dtype=mu_dtype)
            )
        )(learning_rate=scaled_lr(cfg))
    return masked(optax.adam(scaled_lr(cfg), mu_dtype=mu_dtype))


# ---------------------------------------------------------------------------
# named presets == the reference's learn*.py scripts
# ---------------------------------------------------------------------------

PRESETS: dict[str, dict] = {
    # learnSimpleBDModel.py — CE + MSE(residual), self-balanced throughout
    "simple_bd": dict(
        model_kind="one_bin_delta", problem="simple",
        num_warmup_epochs=0,  # single training() phase (learnSimpleBDModel.py:104)
    ),
    # learnSimpleBDModel_rene.py — fine-tune FRESH delta heads on a frozen
    # classifier-grafted oracle (warm start: models.surgery.
    # graft_classifier_into_bd / cli --warm-start-kind classifier):
    # optimizer over res_models only (:136), model.eval() with
    # res_models.train() (:133,148 — train-mode BN in the delta heads,
    # running stats everywhere else), homoscedastic sigma balance on the
    # raw-residual MSE (:160-170); a StepLR is constructed but its
    # scheduler.step() is commented out (:137,223) — constant lr
    "simple_bd_rene": dict(
        model_kind="one_bin_delta", problem="simple_rene",
        num_warmup_epochs=0,  # single training() phase
        train_only=("res_models",),
        bn_train_only=("res_models",),
    ),
    # learnEuclideanBDModel_rene.py — same protocol, sigma-balanced MSE on
    # the DECODED pose (centers[argmax] + residual, :159-170)
    "euclidean_bd_rene": dict(
        model_kind="one_bin_delta", problem="euclidean_rene",
        num_warmup_epochs=0,  # single training() phase
        train_only=("res_models",),
        bn_train_only=("res_models",),
    ),
    # learnGeodesicBDModel.py — the north-star config
    "geodesic_bd": dict(model_kind="one_bin_delta", problem="geodesic"),
    # learnGeodesicBDModel.py --multires
    "geodesic_bd_multires": dict(
        model_kind="one_delta_per_bin", problem="geodesic", multires=True
    ),
    # learnGeodesicBDModel_quaternion.py
    "geodesic_bd_quaternion": dict(
        model_kind="one_bin_delta", problem="geodesic_quat", ndim=4
    ),
    # learnEuclideanBDModel.py / learnLaplacianBDModel.py
    "euclidean_bd": dict(model_kind="one_bin_delta", problem="euclidean"),
    "laplacian_bd": dict(model_kind="one_bin_delta", problem="laplacian"),
    # learnLogEuclideanModel.py ('m2' tangent residuals)
    "log_euclidean_bd": dict(
        model_kind="one_bin_delta", problem="log_euclidean",
        num_warmup_epochs=0,  # single-phase script (learnLogEuclideanModel.py:111)
    ),
    # learnRiemannianBDModel.py — the one self-balanced two-phase script
    # with NO s=0 reset between training_init() and training()
    "riemannian_bd": dict(
        model_kind="one_bin_delta", problem="riemannian",
        reset_s_between_phases=False,
    ),
    # learnProbabilisticBDModel.py (GMM soft bins, expected loss)
    "probabilistic_bd": dict(
        model_kind="one_bin_delta", problem="probabilistic",
        num_warmup_epochs=0,  # single-phase (learnProbabilisticBDModel.py:106)
        epoch_lr_decay="step",  # StepLR(1, 0.1) stepped at :204
    ),
    "probabilistic_bd_multires": dict(
        model_kind="probabilistic", problem="probabilistic_multires",
        multires=True, num_warmup_epochs=0, epoch_lr_decay="step",
    ),
    # RelaXedProbabilisticLossQ / RelaXedProbabilisticMultiresLossQ
    # (binDeltaLosses.py:149-166,197-208) + XPBDGeneratorQ targets
    # (binDeltaGenerators.py:86-110) — reference-dormant loss variants no
    # learn* script invokes; preset conventions mirror probabilistic_bd
    "probabilistic_bd_quaternion": dict(
        model_kind="one_bin_delta", problem="probabilistic_quat", ndim=4,
        num_warmup_epochs=0, epoch_lr_decay="step",
    ),
    "probabilistic_bd_quaternion_multires": dict(
        model_kind="probabilistic", problem="probabilistic_quat_multires",
        ndim=4, multires=True, num_warmup_epochs=0, epoch_lr_decay="step",
    ),
    # ablationXBDModel.py (RBF-relaxed soft bins)
    "relaxed_bd": dict(
        model_kind="one_bin_delta", problem="relaxed_kmeans",
        self_balance=False,  # fixed-alpha criteria, ablationXBDModel.py:67-69
        epoch_lr_decay="step",  # ablationXBDModel.py:96,218
        loss_stream_sum=True,  # loss_real + loss_render, ablationXBDModel.py:120
    ),
    # learnClassificationModel.py (dict_size=100) / _new.py (200)
    "classification": dict(
        model_kind="per_class_classification", problem="classification",
        dict_size=100, num_warmup_epochs=0,
        epoch_lr_decay="step",  # learnClassificationModel.py:94,167
        loss_stream_sum=True,  # loss_real + loss_render, learnClassificationModel.py:118
    ),
    # learnGeodesicRegressionModel.py (--nonlinearity valid)
    "geodesic_regression": dict(
        model_kind="per_class_regression", problem="regression",
        nonlinearity="pi_tanh",
        epoch_lr_decay="step",  # learnGeodesicRegressionModel.py:114,234
        loss_stream_sum=True,  # loss_real + loss_render, learnGeodesicRegressionModel.py:138,178
    ),
    # learnGeodesicRegression_quaternion.py
    "geodesic_regression_quaternion": dict(
        model_kind="per_class_regression", problem="regression_quat",
        ndim=4, nonlinearity="quat",
        epoch_lr_decay="step",  # learnGeodesicRegression_quaternion.py:99
        loss_stream_sum=True,  # loss_real + loss_render, learnGeodesicRegression_quaternion.py:123,163
    ),
    # learnIndependentRegressionModel.py
    "independent_regression": dict(
        model_kind="independent_regression", problem="regression",
        nonlinearity="pi_tanh",
        epoch_lr_decay="step",  # learnIndependentRegressionModel.py:92
    ),
    # learnIndependentBDModel.py (fixed weights CE+MSE -> CE+10*geodesic)
    "independent_bd": dict(
        model_kind="independent_bd", problem="geodesic",
        dict_size=16,  # learnIndependentBDModel.py:33
        alpha=10.0, self_balance=False,
        epoch_lr_decay="step",  # learnIndependentBDModel.py:115,255
    ),
    # learnRenderedBDModel.py (class-agnostic, dict 16, render+real)
    "rendered_bd": dict(
        model_kind="independent_bd", problem="geodesic", dict_size=16,
        alpha=10.0, self_balance=False,
        epoch_lr_decay="step",  # learnRenderedBDModel.py:115,234
    ),
    # learnJointCatPoseModel_{top1,weighted}.py / _top1_new.py ('joint_top1')
    "joint_cat_pose_top1": dict(
        num_warmup_epochs=0,  # joint scripts fine-tune an oracle: no warm-up phase
        model_kind="joint_bd_v1", problem="joint_bd", mixing="top1",
        self_balance=False, num_epochs=50,  # learnJointCatPoseModel_top1.py:33
        epoch_lr_decay="inv",  # my_schedule 1/(1+ep), learnJointCatPoseModel_top1.py:141,219
    ),
    # the _top1_new variant selects the class (and, multires, the bin) by
    # the argmax of the JOINT posterior softmax(bins)*softmax(cat), with a
    # detached one-hot (learnJointCatPoseModel_top1_new.py:110-130)
    "joint_cat_pose_top1_new": dict(
        num_warmup_epochs=0,  # joint scripts fine-tune an oracle: no warm-up phase
        model_kind="joint_bd_v1", problem="joint_bd", mixing="joint_top1",
        self_balance=False, num_epochs=50,  # learnJointCatPoseModel_top1_new.py:34
        epoch_lr_decay="inv",  # my_schedule 1/(1+ep), learnJointCatPoseModel_top1_new.py:144
    ),
    "joint_cat_pose_weighted": dict(
        num_warmup_epochs=0,  # joint scripts fine-tune an oracle: no warm-up phase
        model_kind="joint_bd_v1", problem="joint_bd", mixing="weighted",
        self_balance=False, num_epochs=50,  # learnJointCatPoseModel_weighted.py:34
        epoch_lr_decay="inv",  # my_schedule 1/(1+ep), learnJointCatPoseModel_weighted.py:140
    ),
    # learnJointCatPoseModel2_{top1,weighted}.py (separate category layer4)
    # NOTE the v2 scripts are the ONLY joint scripts defaulting to
    # init_lr=1e-5 (not 1e-4) and 20 (not 50) epochs
    # (learnJointCatPoseModel2_top1.py:35,38)
    "joint_cat_pose2_top1": dict(
        num_warmup_epochs=0,  # joint scripts fine-tune an oracle: no warm-up phase
        model_kind="joint_bd_v2", problem="joint_bd", mixing="top1",
        self_balance=False, num_epochs=20, init_lr=1e-5,
        epoch_lr_decay="inv",  # my_schedule 1/(1+ep), learnJointCatPoseModel2_top1.py:148,226
    ),
    "joint_cat_pose2_weighted": dict(
        num_warmup_epochs=0,  # joint scripts fine-tune an oracle: no warm-up phase
        model_kind="joint_bd_v2", problem="joint_bd", mixing="weighted",
        self_balance=False, num_epochs=20, init_lr=1e-5,
        epoch_lr_decay="inv",  # my_schedule 1/(1+ep), learnJointCatPoseModel2_weighted.py:147
    ),
    # learnJointCatPoseModel3_{top1,weighted}.py (regression oracle)
    "joint_cat_pose3_top1": dict(
        num_warmup_epochs=0,  # joint scripts fine-tune an oracle: no warm-up phase
        model_kind="joint_reg_v3", problem="joint_reg", mixing="top1",
        self_balance=False, num_epochs=50,  # learnJointCatPoseModel3_top1.py:31
        epoch_lr_decay="inv",  # my_schedule 1/(1+ep), learnJointCatPoseModel3_top1.py:129
    ),
    "joint_cat_pose3_weighted": dict(
        num_warmup_epochs=0,  # joint scripts fine-tune an oracle: no warm-up phase
        model_kind="joint_reg_v3", problem="joint_reg", mixing="weighted",
        self_balance=False, num_epochs=50,  # learnJointCatPoseModel3_weighted.py:31
        epoch_lr_decay="inv",  # my_schedule 1/(1+ep), learnJointCatPoseModel3_weighted.py:127
    ),
    # learnElhoseinyBDModel.py / learnElhoseinyRegressionModel.py
    "elhoseiny_bd": dict(
        model_kind="elhoseiny_bd", problem="elhoseiny_bd",
        dict_size=16,  # learnElhoseinyBDModel.py:33
        alpha=10.0, self_balance=False,
        epoch_lr_decay="step",  # learnElhoseinyBDModel.py:117
    ),
    "elhoseiny_regression": dict(
        model_kind="elhoseiny_reg", problem="elhoseiny_reg",
        self_balance=False,
        epoch_lr_decay="step",  # learnElhoseinyRegressionModel.py:98
    ),
    # learnCategorizationModel.py (12-way category classifier over a FROZEN
    # backbone: requires_grad=False + model.eval() during training, :64-66 —
    # BN runs on running stats and never updates)
    "categorization": dict(
        model_kind="categorization", problem="category", self_balance=False,
        num_epochs=50,  # learnCategorizationModel.py:36
        train_only=("category_model",),
        frozen_bn=True,  # model.eval() through training(), learnCategorizationModel.py:66,75
        epoch_lr_decay="inv",  # LambdaLR 1/(1+ep), learnCategorizationModel.py:69,118
    ),
    # learnCatGivenPoseModel.py — category fc trained on a FROZEN BD oracle
    "cat_given_pose": dict(
        model_kind="joint_bd_v1", problem="category", self_balance=False,
        num_epochs=50,  # learnCatGivenPoseModel.py:33
        train_only=("fc",),
        frozen_bn=True,  # feature_model.eval() + never model.train(), learnCatGivenPoseModel.py:109-117,135
        epoch_lr_decay="inv",  # my_schedule 1/(1+ep), learnCatGivenPoseModel.py:121,127,204
    ),
    # learnCatGivenPoseModel3.py — frozen regression oracle
    "cat_given_pose3": dict(
        model_kind="joint_reg_v3", problem="category", self_balance=False,
        num_epochs=50,  # learnCatGivenPoseModel3.py:30
        train_only=("fc",),
        frozen_bn=True,  # feature_model.eval() + never model.train(), learnCatGivenPoseModel3.py:113-118,135
        epoch_lr_decay="inv",  # learnCatGivenPoseModel3.py:121,127,204
    ),
    # learnObjectnetModel.py — fixed analytic quaternion dictionary, 100
    # classes, label-concat heads, single (real-only) train loader
    "objectnet_quat": dict(
        model_kind="labelconcat_bd", problem="objectnet_quat",
        num_classes=100, dict_size=16, ndim=4, alpha=10.0,
        num_epochs=10,  # learnObjectnetModel.py:32
        self_balance=False, epoch_lr_decay="objectnet",
    ),
    # learnObjectnetBDModel.py (axis-angle, learned kmeans dictionary)
    "objectnet_bd": dict(
        model_kind="labelconcat_bd", problem="geodesic",
        num_classes=100, alpha=10.0, self_balance=False,
        num_epochs=10,  # learnObjectnetBDModel.py:30
        epoch_lr_decay="objectnet",  # scheduler.step() at :190
    ),
    "objectnet_bd_multires": dict(
        model_kind="labelconcat_delta_per_bin", problem="geodesic",
        # dict_size 16: the script builds OneDeltaPerBinModel(num_classes)
        # with the ctor default 16 heads (:83, objectnetHelperFunctions.py:176)
        # — runnable only with a 16-atom dictionary (--dict_size 16); the
        # argparse default 200 would CE-index past the 16 bin scores
        num_classes=100, dict_size=16, alpha=10.0, self_balance=False,
        num_epochs=10,
        epoch_lr_decay="objectnet",
    ),
    # learnObjectnetRegressionModel.py / learnObjectnetClassificationModel.py
    # — NO epoch LR decay: both scripts comment their scheduler.step() out
    # (learnObjectnetRegressionModel.py:162, learnObjectnetClassificationModel.py:145)
    "objectnet_regression": dict(
        model_kind="labelconcat_regression", problem="regression",
        num_classes=100, self_balance=False,
        num_epochs=10,  # learnObjectnetRegressionModel.py:26
    ),
    "objectnet_classification": dict(
        model_kind="labelconcat_classification", problem="classification",
        # dict_size 200: the script passes args.dict_size (default 200,
        # :29) into ClassificationModel(:80), overriding the ctor's 16
        num_classes=100, dict_size=200, self_balance=False,
        num_epochs=10,  # learnObjectnetClassificationModel.py:28
        num_warmup_epochs=0,  # single-phase (learnObjectnetClassificationModel.py:89)
    ),
    # ablationGeodesicBDModel.py — geodesic BD evaluated on the val split
    # (model selection); identical objective, ablation data split
    "ablation_geodesic_bd": dict(
        model_kind="one_bin_delta", problem="geodesic", self_balance=False,
        epoch_lr_decay="step",  # ablationGeodesicBDModel.py:95,217
        loss_stream_sum=True,  # loss_real + loss_render, ablationGeodesicBDModel.py:117
    ),
    # ablationXBDModel.py — relaxed soft bins with data-driven gamma
    # (get_gamma over the dictionary, ablationXBDModel.py:61-62)
    "ablation_xbd": dict(
        model_kind="one_bin_delta", problem="relaxed_kmeans", gamma=None,
        dict_size=100,  # ablationXBDModel.py:34 (GMM dictionary, not the usual 200)
        self_balance=False,  # fixed-alpha criteria, ablationXBDModel.py:67-69
        epoch_lr_decay="step",  # ablationXBDModel.py:96,218
        loss_stream_sum=True,  # loss_real + loss_render, ablationXBDModel.py:120
    ),
    # ablationGBDAugmentation.py — same objective; the augmented-vs-render
    # data selection is the loader choice (--type real/render/both)
    "ablation_gbd_augmentation": dict(
        model_kind="one_bin_delta", problem="geodesic", self_balance=False,
        dict_size=100,  # ablationGBDAugmentation.py:34 (not the usual 200)
        epoch_lr_decay="step",  # ablationGBDAugmentation.py:99,205
    ),
    # ablationDictionarySizeC0.py — classification-only dict-size sweep
    "ablation_c0": dict(
        model_kind="per_class_classification", problem="classification",
        num_warmup_epochs=0,
        epoch_lr_decay="step",  # ablationDictionarySizeC0.py:97,168
        loss_stream_sum=True,  # loss_real + loss_render, ablationDictionarySizeC0.py:120
    ),
}


def get_config(preset: str, **overrides) -> ExperimentConfig:
    if preset not in PRESETS:
        raise KeyError(
            f"unknown preset {preset!r}; available: {sorted(PRESETS)}"
        )
    base = dict(PRESETS[preset])
    base.update(overrides)
    return ExperimentConfig(preset=preset, **base)
