"""Training: problems, presets, compiled steps, Trainer, schedules."""

from multi_modal_regression_tpu.train.problems import Problem, make_problem
from multi_modal_regression_tpu.train.presets import (
    PRESETS,
    ExperimentConfig,
    build_model,
    build_optimizer,
    build_problem,
    get_config,
    make_apply_fn,
)
from multi_modal_regression_tpu.train.schedules import (
    cyclical_sgd,
    cyclical_triangular,
    is_snapshot_step,
)
from multi_modal_regression_tpu.train.evaluator import (
    SnapshotEnsembleEvaluator,
    ensemble_poses,
)
from multi_modal_regression_tpu.train.joint_problems import (
    make_joint_problem,
    masked_cross_entropy,
)
from multi_modal_regression_tpu.train.state import TrainState, create_train_state
from multi_modal_regression_tpu.train.steps import make_eval_step, make_train_step
from multi_modal_regression_tpu.train.trainer import Trainer

__all__ = [
    "Problem",
    "make_problem",
    "PRESETS",
    "ExperimentConfig",
    "build_model",
    "build_optimizer",
    "build_problem",
    "get_config",
    "make_apply_fn",
    "cyclical_sgd",
    "cyclical_triangular",
    "is_snapshot_step",
    "SnapshotEnsembleEvaluator",
    "ensemble_poses",
    "make_joint_problem",
    "masked_cross_entropy",
    "TrainState",
    "create_train_state",
    "make_eval_step",
    "make_train_step",
    "Trainer",
]
