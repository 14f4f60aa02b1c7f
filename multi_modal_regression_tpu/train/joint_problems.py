"""Joint category + pose objectives (the two-stage and multi-task scripts).

Loss compositions (from the reference training loops):

  joint_bd        0.1 * Lc_cat + Lc_pose + alpha * Lr_geodesic
                  (learnJointCatPoseModel_top1.py:176-181; variant 1/3
                  compute the category CE on REAL images only, variant 2 on
                  all images — learnJointCatPoseModel2_weighted.py:171-177)
  joint_reg       0.1 * Lc_cat(real) + Lr_geodesic
                  (learnJointCatPoseModel3_top1.py:156-160)
  elhoseiny_bd    warmup  Lc_cat(real) + Lc_pose + Lr_mse(residual)
                  main    0.1 * Lc_cat(real) + Lc_pose + 10 * Lr_geodesic
                  (learnElhoseinyBDModel.py:147-150 and the later phase)
  elhoseiny_reg   warmup  Lc_cat(real) + Lr_mse
                  main    0.1 * Lc_cat(real) + Lr_geodesic
                  (learnElhoseinyRegressionModel.py:122-124,167-169)
  category        CE on the category logits only; headline metric is mean
                  per-class accuracy (learnCategorizationModel.py,
                  learnCatGivenPoseModel.py:144 — backbone freezing is an
                  optimizer mask, see presets.build_optimizer)

Joint models return (cat_logits, scores, residual) or (cat_logits, pose);
the fixed weights live here (no self-balancing in any reference joint
script — the balanced form is commented out at
learnJointCatPoseModel2_weighted.py:176-182).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

from multi_modal_regression_tpu.data.targets import hard_bin_targets
from multi_modal_regression_tpu.losses import geodesic_aa, mse
from multi_modal_regression_tpu.train.problems import Problem


def masked_cross_entropy(
    logits: jax.Array, labels: jax.Array, mask: jax.Array
) -> jax.Array:
    """CE averaged over rows where mask is True."""
    logp = jax.nn.log_softmax(logits, axis=-1)
    nll = -jnp.take_along_axis(logp, labels[..., None], axis=-1)[..., 0]
    m = mask.astype(nll.dtype)
    return jnp.sum(nll * m) / jnp.maximum(jnp.sum(m), 1.0)


def _cat_ce(cat_logits, tg, real_only: bool):
    mask = tg["is_real"] if real_only else jnp.ones_like(tg["is_real"])
    return masked_cross_entropy(cat_logits, tg["class_label"], mask)


def make_joint_problem(
    name: str,
    centers: np.ndarray | None = None,
    *,
    alpha: float = 1.0,
    cat_on_real_only: bool = True,
) -> Problem:
    """Build a joint cat+pose Problem (losses return (lc_combined, lr))."""

    if name == "joint_bd":
        C = jnp.asarray(centers, jnp.float32)

        def targets(y):
            bins, res = hard_bin_targets(y, C)
            return {"y": y, "bins": bins, "res": res}

        def warmup(out, tg):
            cat, scores, residual = out
            lc = 0.1 * _cat_ce(cat, tg, cat_on_real_only) + masked_cross_entropy(
                scores, tg["bins"], jnp.ones_like(tg["is_real"])
            )
            return lc, mse(residual, tg["res"])

        def main(out, tg):
            cat, scores, residual = out
            lc = 0.1 * _cat_ce(cat, tg, cat_on_real_only) + masked_cross_entropy(
                scores, tg["bins"], jnp.ones_like(tg["is_real"])
            )
            ind = jnp.argmax(scores, axis=-1)
            return lc, geodesic_aa(C[ind] + residual, tg["y"])

        def decode(out):
            _, scores, residual = out
            return C[jnp.argmax(scores, axis=-1)] + residual

        return Problem(
            name, "axis_angle", targets, warmup, main, decode,
            warmup_balance=None, main_balance=None,
        )

    if name == "joint_reg":

        def targets(y):
            return {"y": y}

        def warmup(out, tg):
            cat, pose = out
            return 0.1 * _cat_ce(cat, tg, cat_on_real_only), mse(pose, tg["y"])

        def main(out, tg):
            cat, pose = out
            return 0.1 * _cat_ce(cat, tg, cat_on_real_only), geodesic_aa(
                pose, tg["y"]
            )

        return Problem(
            name, "axis_angle", targets, warmup, main,
            lambda out: out[1],
            warmup_balance=None, main_balance=None,
        )

    if name == "elhoseiny_bd":
        C = jnp.asarray(centers, jnp.float32)

        def targets(y):
            bins, res = hard_bin_targets(y, C)
            return {"y": y, "bins": bins, "res": res}

        def warmup(out, tg):
            cat, scores, residual = out
            lc = _cat_ce(cat, tg, True) + masked_cross_entropy(
                scores, tg["bins"], jnp.ones_like(tg["is_real"])
            )
            return lc, mse(residual, tg["res"])  # weights 1 + 1 + 1

        def main(out, tg):
            cat, scores, residual = out
            lc = 0.1 * _cat_ce(cat, tg, True) + masked_cross_entropy(
                scores, tg["bins"], jnp.ones_like(tg["is_real"])
            )
            ind = jnp.argmax(scores, axis=-1)
            return lc, geodesic_aa(C[ind] + residual, tg["y"])  # alpha=10

        def decode(out):
            _, scores, residual = out
            return C[jnp.argmax(scores, axis=-1)] + residual

        return Problem(
            name, "axis_angle", targets, warmup, main, decode,
            warmup_balance=None, main_balance=None,
        )

    if name == "elhoseiny_reg":

        def targets(y):
            return {"y": y}

        def warmup(out, tg):
            cat, pose = out
            return _cat_ce(cat, tg, True), mse(pose, tg["y"])

        def main(out, tg):
            cat, pose = out
            return 0.1 * _cat_ce(cat, tg, True), geodesic_aa(pose, tg["y"])

        return Problem(
            name, "axis_angle", targets, warmup, main,
            lambda out: out[1],
            warmup_balance=None, main_balance=None,
        )

    if name == "category":

        def targets(y):
            return {"y": y}

        def losses(out, tg):
            cat = out[0] if isinstance(out, tuple) else out
            return _cat_ce(cat, tg, True), jnp.zeros(())

        def decode(out):
            cat = out[0] if isinstance(out, tuple) else out
            return jnp.argmax(cat, axis=-1).astype(jnp.int32)

        return Problem(
            name, "axis_angle", targets, losses, losses, decode,
            warmup_balance=None, main_balance=None,
            metric="category_accuracy",
        )

    raise ValueError(f"unknown joint problem {name!r}")
