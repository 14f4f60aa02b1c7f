"""Compiled train / eval step factories.

One train step = H2D of a uint8 batch + ONE compiled program doing:
normalize -> euler->pose -> targets -> forward -> loss -> backward ->
optimizer update -> BN stats update -> self-balance update. Nothing
crosses back to the host but the metric scalars. This fuses away every
per-step sync the reference performs (CPU one-hot scatter, `loss.item()`,
`s = log(Lr)` — learnGeodesicBDModel.py:163-185, SURVEY.md §3.1).

`apply_fn(variables, images, labels, train)` adapts the model-call
signature (per-class models take labels, independent/joint ones don't) —
see presets.py for the adaptors.
"""

from __future__ import annotations

from typing import Any, Callable

import jax
import jax.numpy as jnp
import optax

from multi_modal_regression_tpu.data.targets import euler_to_pose
from multi_modal_regression_tpu.ops.preprocess import (
    normalize_images_pallas as normalize_images,
)
from multi_modal_regression_tpu.losses.self_balance import self_balanced
from multi_modal_regression_tpu.train.problems import Problem
from multi_modal_regression_tpu.train.state import TrainState

ApplyFn = Callable[..., Any]

# Every BatchNorm in the package carries torch's default running-stat decay
# (flax momentum 0.9): models/backbones.py:_bn, models/heads.py, and the
# fused-path _BNState all pin momentum=0.9. The fused dual-stream EMA
# composition below relies on this single value; test_dual_stream_fused
# certifies the composition against the literal two-forward chain.
_BN_MOMENTUM = 0.9


def _fused_dual_stream_apply(apply_fn: ApplyFn, variables, images, labels):
    """The reference's two-forward dual-loader protocol in ONE forward.

    Semantics being reproduced (learnGeodesicBDModel.py:116-121): every
    dual-loader script calls model(real) then model(render) — train-mode
    BatchNorm normalizes each stream by its OWN batch statistics, and the
    running stats take two sequential EMA updates per step (real first).
    Because train-mode BN never READS the running stats, the two forwards
    are data-independent; only the EMA chain links them. So:

      * the forward runs as ONE vmapped apply over a leading (real, render)
        stream axis — XLA's conv batching collapses the vmap axis into the
        batch, so the trunk runs full-batch conv pipelines (the whole point:
        two half-batch convs tile the MXU ~7% worse, BASELINE.md round 5)
        while the BN reductions stay per-stream;
      * the sequential EMA chain is recovered algebraically. vmap gives each
        stream's update from the SAME base r: mut_i = m*r + (1-m)*u_i.
        The reference's chain is r_b = m*r_a + (1-m)*u_b with r_a = mut_a,
        i.e. r_b = mut_b + m*(mut_a - r). Exact in exact arithmetic for
        every leaf (including eval-mode/frozen BNs, where mut_i == r and
        the formula returns r unchanged); differs from the literal chain
        only in rounding order, ~1 ulp of the running stat.

    Returns (outputs concatenated real-then-render, composed batch_stats).
    """
    n = images.shape[0] // 2
    imgs2 = images.reshape((2, n) + images.shape[1:])
    lbls2 = labels.reshape((2, n) + labels.shape[1:])
    out2, mut2 = jax.vmap(
        lambda im, lb: apply_fn(variables, im, lb, True)
    )(imgs2, lbls2)
    outputs = jax.tree.map(lambda a: a.reshape((2 * n,) + a.shape[2:]), out2)
    m = _BN_MOMENTUM
    new_bs = jax.tree.map(
        lambda ab, r: ab[1] + m * (ab[0] - r),
        mut2["batch_stats"],
        variables["batch_stats"],
    )
    return outputs, new_bs


def _preprocess(batch: dict, resize_to: int | None, dtype=None) -> jax.Array:
    """uint8 batch -> normalized images; with resize_to set, raw-size
    images are bilinear-resized ON DEVICE first (ops.augment — the loaders
    then skip the host PIL resize). Flips are applied by the caller AFTER
    normalization (they commute with per-channel scaling), keeping the
    Pallas fused-normalize fast path in use.

    `dtype` emits the normalized images directly in the model's compute
    dtype: producing f32 and casting in the backbone costs the stem conv a
    double-width read plus a materialized cast pass (xplane, round 2)."""
    import jax.numpy as jnp

    dtype = dtype or jnp.float32
    if resize_to is not None:
        from multi_modal_regression_tpu.ops.augment import device_preprocess

        # dtype goes through device_preprocess so the normalize emits the
        # compute dtype directly — an .astype() here would retain the
        # double-width write + materialized cast pass this path avoids
        return device_preprocess(batch["xdata"], out_size=resize_to, dtype=dtype)
    return normalize_images(batch["xdata"], dtype=dtype)


def validate_dual_stream_layout(batch: dict) -> None:
    """Per-stream BN (dual_stream_bn) splits each batch at its midpoint
    into (real, render) halves; refuse any batch whose `is_real` mask is
    not exactly [real*n, render*n] — e.g. loaders with different batch
    sizes — which would silently mix render rows into the real stream's
    batch statistics. Shared by Trainer.run_epoch and the
    SnapshotEnsembleEvaluator fine-tune loop."""
    m = batch["is_real"]
    half = len(m) // 2
    if len(m) % 2 or not m[:half].all() or m[half:].any():
        raise ValueError(
            "bn_per_stream needs equal real/render halves per step "
            "(match the two loaders' batch sizes, as the reference does) "
            f"— got a {int(m.sum())}/{int(len(m) - m.sum())} split"
        )


def make_train_step(
    apply_fn: ApplyFn,
    problem: Problem,
    tx: optax.GradientTransformation,
    phase: str = "main",
    alpha: float = 1.0,
    axis_name: str | None = None,
    resize_to: int | None = None,
    random_flip: bool = False,
    compute_dtype=None,
    remat: str | None = None,
    frozen_bn: bool = False,
    dual_stream_bn: bool = False,
    dual_loss_sum: bool = False,
    dual_stream_fused: bool = True,
):
    """Build a jit-able train step for (model, problem, optimizer, phase).

    dual_stream_bn=True reproduces the reference's dual-loader forward
    EXACTLY: every two-loader script runs model(real) and model(render) as
    two separate calls (learnGeodesicBDModel.py:116-121), so train-mode
    BatchNorm normalizes each stream by its OWN batch statistics and the
    running stats take two sequential EMA updates per step (real first).
    The batch must be the _interleave layout — first half real, second half
    render — and the losses still see the concatenated outputs, like the
    reference's torch.cat before the loss (:122-127). Off (default) the
    whole batch shares one forward — the single-loader semantics.
    dual_stream_fused picks the execution strategy for the same semantics:
    True (default) runs one vmapped forward over the stream axis with the
    EMA chain composed algebraically (_fused_dual_stream_apply — full-batch
    conv pipelines, measured faster); False runs the literal two sequential
    half-batch forwards. Identical up to reduction-order rounding.

    dual_loss_sum=True models the scripts that compute each stream's loss
    separately and SUM them (`loss = loss_real + loss_render`,
    learnGeodesicRegressionModel.py:138,178; the classification and
    ablation families do the same) instead of one loss over the concat.
    With equal halves every mean-reduced criterion satisfies
    mean(real) + mean(render) == 2 * mean(concat), so the exact
    transformation is a factor-2 scale on (loss, lc, lr). Only meaningful
    together with dual_stream_bn (the same scripts are two-forward); all
    of them run fixed weights, so it composes with balance=None only.

    frozen_bn=True runs the forward in EVAL BatchNorm mode (running
    statistics, no batch-stat computation or update) while still training
    every parameter — torch's `model.eval()`-during-training quirk
    (learnSimpleBDModel_rene.py:133), offered as a flagged fast mode for
    fine-tuning converged models (the snapshot-ensemble protocol): the
    backward no longer differentiates through batch statistics.

    phase 'warmup' uses problem.warmup_losses/warmup_balance; 'main' uses
    main_losses/main_balance. When the balance mode is None the loss is the
    fixed combination Lc + alpha * Lr. `axis_name` is unused under jit-SPMD
    (XLA inserts the psum) but kept for shard_map-style use.

    `remat` selects a rematerialization policy (train/remat.py): the loss
    function is wrapped in jax.checkpoint so only the policy's activations
    survive to the backward pass and the rest recompute — the
    bandwidth-for-FLOPs trade on the BN-bound ResNet trunk.

    random_flip=True applies per-sample horizontal flips ON DEVICE with the
    matching (-az, el, -ct) pose transform — the train-time form of the
    reference's offline flipped copies (setupDataFlipped_pascal3d.m:120-121),
    without doubling the dataset on disk.
    """
    if phase == "warmup":
        loss_pair, balance = problem.warmup_losses, problem.warmup_balance
    elif phase == "main":
        loss_pair, balance = problem.main_losses, problem.main_balance
    else:
        raise ValueError(f"phase must be warmup|main, got {phase!r}")
    loss_scale = 2.0 if (dual_stream_bn and dual_loss_sum) else 1.0
    if dual_loss_sum and balance is not None:
        raise ValueError(
            "dual_loss_sum models fixed-weight stream-sum scripts; none of "
            "them self-balance (balance must be None)"
        )
    from multi_modal_regression_tpu.train.remat import remat_policy

    policy = remat_policy(remat)

    def train_step(state: TrainState, batch: dict):
        rng = state.rng
        euler = batch["euler"]
        images = _preprocess(batch, resize_to, compute_dtype)
        if random_flip:
            from multi_modal_regression_tpu.ops.augment import (
                flip_images,
                flip_pose_euler,
            )

            rng, sub = jax.random.split(state.rng)
            flip = jax.random.bernoulli(sub, 0.5, (euler.shape[0],))
            euler = flip_pose_euler(euler, flip)
            # flip after normalize: commutes, and keeps the Pallas
            # fused-normalize path in use
            images = flip_images(images, flip)
        y = euler_to_pose(euler, problem.ydata_type)
        tg = dict(problem.targets(y))
        # joint cat+pose objectives also see the class labels and which rows
        # are real images (the reference computes the category CE on real
        # images only, learnJointCatPoseModel_top1.py:176)
        tg["class_label"] = batch["label"]
        tg["is_real"] = batch.get(
            "is_real", jnp.ones_like(batch["label"], dtype=bool)
        )

        def loss_fn(params):
            variables = {"params": params, "batch_stats": state.batch_stats}

            def _finish(lc, lr, new_bs):
                if balance is None:
                    # loss_scale = 2 models the stream-sum scripts'
                    # loss_real + loss_render (== 2 * concat mean)
                    lc_s, lr_s = loss_scale * lc, loss_scale * lr
                    loss = lc_s + alpha * lr_s
                    return loss, (lc_s, lr_s, state.s, new_bs)
                loss, s_next = self_balanced(lc, lr, state.s, mode=balance)
                return loss, (lc, lr, s_next, new_bs)

            if frozen_bn:
                outputs = apply_fn(variables, images, batch["label"], False)
                new_bs = state.batch_stats
            elif dual_stream_bn:
                if images.shape[0] % 2:
                    raise ValueError(
                        "dual_stream_bn needs an even batch (equal "
                        "real/render halves from _interleave), got "
                        f"{images.shape[0]}"
                    )
                if dual_stream_fused:
                    outputs, new_bs = _fused_dual_stream_apply(
                        apply_fn, variables, images, batch["label"]
                    )
                    lc, lr = loss_pair(outputs, tg)
                    return _finish(lc, lr, new_bs)
                n = images.shape[0] // 2
                out_a, mut_a = apply_fn(
                    variables, images[:n], batch["label"][:n], True,
                )
                # the render forward happens AFTER the real one in the
                # reference, so its EMA update composes on top of the real
                # stream's (train-mode BN ignores running stats in the
                # forward — only the stat chain links the two applies)
                out_b, mut_b = apply_fn(
                    {"params": params, "batch_stats": mut_a["batch_stats"]},
                    images[n:], batch["label"][n:], True,
                )
                outputs = jax.tree.map(
                    lambda a, b: jnp.concatenate([a, b], axis=0), out_a, out_b
                )
                new_bs = mut_b["batch_stats"]
            else:
                outputs, mutated = apply_fn(
                    variables, images, batch["label"], True,
                )
                new_bs = mutated["batch_stats"]
            lc, lr = loss_pair(outputs, tg)
            return _finish(lc, lr, new_bs)

        loss_fn_used = (
            jax.checkpoint(loss_fn, policy=policy)
            if policy is not None else loss_fn
        )
        (loss, (lc, lr, s_next, new_stats)), grads = jax.value_and_grad(
            loss_fn_used, has_aux=True
        )(state.params)
        updates, new_opt = tx.update(grads, state.opt_state, state.params)
        new_params = optax.apply_updates(state.params, updates)
        new_state = state.replace(
            step=state.step + 1,
            params=new_params,
            batch_stats=new_stats,
            opt_state=new_opt,
            s=s_next,
            rng=rng,
        )
        # 'alpha' = the effective Lr weight, logged post-update like the
        # reference (0.5*exp(-2s) in warm-up form, exp(-s) in main form —
        # learnGeodesicBDModel.py:137,189); constant when balance is off
        if balance is None:
            alpha_logged = jnp.asarray(alpha, jnp.float32)
        elif balance == "warmup":
            alpha_logged = 0.5 * jnp.exp(-2.0 * s_next)
        else:
            alpha_logged = jnp.exp(-s_next)
        # s is logged post-update so the (s, alpha) pair is consistent
        metrics = {
            "loss": loss, "lc": lc, "lr": lr, "s": s_next,
            "alpha": alpha_logged,
        }
        return new_state, metrics

    return train_step


def make_eval_step(
    apply_fn: ApplyFn, problem: Problem, resize_to: int | None = None,
    compute_dtype=None,
):
    """Build a jit-able eval step: batch -> (ypred, ytrue) on device.

    The decode (dictionary lookup + residual add) runs in-graph, replacing
    the reference's host-numpy decode per test batch
    (learnGeodesicBDModel.py:217-219).
    """

    def eval_step(state: TrainState, batch: dict):
        images = _preprocess(batch, resize_to, compute_dtype)
        if "euler" in batch:
            y = euler_to_pose(batch["euler"], problem.ydata_type)
        else:
            # precomputed .mat crops ship axis-angle 'ydata' directly; the
            # quaternion conversion happens here on device (the reference
            # converts on host per batch, dataGenerators.py:110-115)
            y = batch["ydata"]
            if problem.ydata_type == "quaternion":
                from multi_modal_regression_tpu.geometry.quaternion import (
                    quat_from_axis_angle,
                )

                y = quat_from_axis_angle(y)
        variables = {"params": state.params, "batch_stats": state.batch_stats}
        outputs = apply_fn(variables, images, batch["label"], False)
        return problem.decode(outputs), y

    return eval_step


def jit_train_step(train_step, donate_state: bool = True):
    """jit with the state donated (updates in place on device)."""
    return jax.jit(train_step, donate_argnums=(0,) if donate_state else ())
