"""The joint-model ANALYSIS protocol (evaluateJointModel.py /
evaluateJointModel2.py).

Those two reference scripts are pure inference dumps: a wrapper forward
(evaluateJointModel.py:69-104) computes the category logits plus ONE
decoded pose PER (sample, class) — `centers[argmax(bin_i)] + res_i` for
every class head i, independent of any mixing mode — and `testing()`
(:112-134) collects {ytrue_cat, ytrue_pose, ypred_cat, ypred_pose} over
the test set, repeated for up to four checkpoints (oracle / cat / top1 /
wgt, :137-161) into one `results/<save_str>_<db_type>_analysis` .mat.

Here the per-class decode runs in-graph over the padded test stream (one
jitted program; the reference loops classes in python and argmaxes on
host), and the .mat writer reproduces the reference layout so downstream
analysis tooling reads either file.
"""

from __future__ import annotations

from pathlib import Path
from typing import Sequence

import jax
import jax.numpy as jnp
import numpy as np

from multi_modal_regression_tpu.data.targets import euler_to_pose
from multi_modal_regression_tpu.train.steps import _preprocess


def make_analysis_step(model, problem, centers, resize_to=None,
                       compute_dtype=None):
    """batch -> (ytrue_cat, ytrue_pose, ypred_cat, ypred_pose) on device.

    ypred_pose is (B, D, C) — the reference's `torch.stack(ypred).permute(
    1, 2, 0)` layout (evaluateJointModel.py:102); ypred_cat is the cat
    argmax (:122)."""
    C = jnp.asarray(centers, jnp.float32)

    def step(state, batch):
        images = _preprocess(batch, resize_to, compute_dtype)
        variables = {"params": state.params, "batch_stats": state.batch_stats}
        cat_logits, per_head, res = model.apply(
            variables, images, False, method=type(model).analysis
        )
        ind = jnp.argmax(per_head, axis=-1)  # (B, C)
        ypose = C[ind] + res  # (B, C, D)
        if "euler" in batch:
            ytrue = euler_to_pose(batch["euler"], problem.ydata_type)
        else:
            ytrue = batch["ydata"]
        return (
            batch["label"],
            ytrue,
            jnp.argmax(cat_logits, axis=-1),
            jnp.transpose(ypose, (0, 2, 1)),
        )

    return step


def run_joint_analysis(trainer, state, test_loader, centers,
                       shard: bool = True) -> dict:
    """One checkpoint's analysis pass: the reference testing() dict
    {ytrue_cat, ytrue_pose, ypred_cat, ypred_pose} as numpy arrays
    (evaluateJointModel.py:112-134).

    shard=False runs process-local (state pinned to one local device, plain
    numpy batches) — the multi-host CLI path, where one process analyzes the
    full test set; sharding there would build global arrays and hang waiting
    for peers that are not in this loop."""
    from multi_modal_regression_tpu.train.presets import resolve_compute_dtype

    cfg = trainer.config
    step = jax.jit(
        make_analysis_step(
            trainer.model, trainer.problem, centers,
            resize_to=cfg.image_size if cfg.device_resize_from else None,
            compute_dtype=resolve_compute_dtype(cfg.compute_dtype),
        )
    )
    cats_t, poses_t, cats_p, poses_p = [], [], [], []
    for batch in test_loader:
        valid = batch.pop("valid")
        if shard:
            batch = trainer.shard_batch(batch)
        tc, tp, pc, pp = step(state, batch)
        cats_t.append(np.asarray(tc)[valid])
        poses_t.append(np.asarray(tp)[valid])
        cats_p.append(np.asarray(pc)[valid])
        poses_p.append(np.asarray(pp)[valid])
    return {
        "ytrue_cat": np.concatenate(cats_t),
        "ytrue_pose": np.concatenate(poses_t),
        "ypred_cat": np.concatenate(cats_p),
        "ypred_pose": np.concatenate(poses_p),
    }


def analysis_report(result: dict, num_classes: int) -> dict:
    """The offline numbers the reference computes from its analysis .mat in
    MATLAB (computeGeodesicError.m over `ypred_pose(:, :, class)` slices +
    the category accuracy): mean-class cat accuracy, and the pose MedErr /
    Acc@30 under both class selections — the ORACLE pose (true class, the
    script's 'pose' checkpoint protocol) and the pose at the PREDICTED
    category (the joint protocol the paper reports)."""
    from multi_modal_regression_tpu.metrics.pose_error import (
        mean_class_accuracy,
        per_class_report,
    )

    ytrue_cat = np.asarray(result["ytrue_cat"]).ravel()
    ypred_cat = np.asarray(result["ypred_cat"]).ravel()
    ypose = np.asarray(result["ypred_pose"])  # (N, D, C)
    ytrue = np.asarray(result["ytrue_pose"])
    idx = np.arange(len(ytrue_cat))
    out = {
        "cat_acc": mean_class_accuracy(ytrue_cat, ypred_cat, num_classes),
    }
    for sel, cats in (("oracle", ytrue_cat), ("predcat", ypred_cat)):
        yhat = ypose[idx, :, cats]
        # per_class_report groups by TRUE class (absent classes skipped,
        # like mean_class_accuracy); the mean row is the headline pair
        table = per_class_report(ytrue, yhat, ytrue_cat,
                                 list(range(num_classes)))
        out[f"mederr_{sel}"] = table["mean"]["median_err_deg"]
        out[f"acc30_{sel}"] = table["mean"]["acc_30deg"]
    return out


def save_analysis_mat(path: str | Path, results: dict[str, dict]) -> None:
    """Write the reference's combined analysis file: one struct per run
    keyed `<name>_results` (evaluateJointModel.py:160-161 writes
    pose/cat/top1/wgt; evaluateJointModel2.py:164 omits cat)."""
    import scipy.io as spio

    spio.savemat(
        str(path), {f"{name}_results": r for name, r in results.items()}
    )


def parse_analysis_runs(
    checkpoints: Sequence[str], names: Sequence[str] | None
) -> list[tuple[str, str]]:
    """CLI helper: pair run names with checkpoint paths. Default names
    follow the reference's four-stage order (pose, cat, top1, wgt) for up
    to four checkpoints."""
    default = ["pose", "cat", "top1", "wgt"]
    if names is None:
        if len(checkpoints) > len(default):
            raise SystemExit(
                "more than 4 analysis checkpoints need explicit "
                "--analysis-names"
            )
        names = default[: len(checkpoints)]
    if len(names) != len(checkpoints):
        raise SystemExit(
            f"--analysis-names has {len(names)} names for "
            f"{len(checkpoints)} checkpoints"
        )
    return list(zip(names, checkpoints))
