"""Joint category + pose models.

The reference's two-stage pipelines graft a category head onto a pretrained
pose "oracle" and mix the per-class pose heads by the *predicted* category:

  JointCatPoseBDModel      variant 1: category fc on the shared features
                           (learnJointCatPoseModel_top1.py:93-127,
                            _weighted.py:94-126, _top1_new.py:107-130)
  JointCatPoseBDModel2     variant 2: shared stage-1..3 trunk, a SEPARATE
                           layer4 branch for the category
                           (learnJointCatPoseModel2_weighted.py:92-137)
  JointCatPoseRegModel     variant 3: pure-regression oracle, pi*tanh
                           (learnJointCatPoseModel3_top1.py:96-118)
  ElhoseinyBDModel         single-stage multi-task: class-agnostic BD heads
                           + category linear head (learnElhoseinyBDModel.py:88-111)
  ElhoseinyRegressionModel same with a shared regression head
                           (learnElhoseinyRegressionModel.py)

Mixing modes (`mixing` field):
  'top1'       hard one-hot of argmax(category logits); no gradient through
               the selection (reference scatters on CPU).
  'joint_top1' hard one-hot of the class at the argmax of the JOINT
               posterior Plc = softmax(bin scores) * softmax(cat logits),
               detached; multires also takes the joint bin index — the
               actual learnJointCatPoseModel_top1_new.py:110-130 forward.
               (Tie caveat: the reference argmaxes a (K, C)-flattened view
               and we a (C, K) one, so exact float ties — measure-zero —
               could break differently.)
  'top1_st'    straight-through: forward = hard one-hot of the cat argmax,
               backward = softmax gradient. NOT a reference script's
               semantics (kept as a documented extra; an earlier reading of
               _top1_new.py before the joint_top1 audit).
  'weighted'   softmax(category logits) — a soft mixture over class heads;
               gradients flow into the category fc.

All mixing is a single einsum over the class axis of the vectorized head
banks — the reference's bmm-with-one-hot, kept on device.
"""

from __future__ import annotations

from typing import Any

import jax
import jax.numpy as jnp
from flax import linen as nn

from multi_modal_regression_tpu.models.backbones import (
    ResNetBackbone,
    ResNetStage,
    make_backbone,
)
from multi_modal_regression_tpu.models.heads import (
    MultiHeadMLP,
    SharedMLP,
    apply_output_nonlinearity,
)


def class_weights(cat_logits: jax.Array, mixing: str) -> jax.Array:
    """Category logits (B, C) -> mixing weights (B, C)."""
    if mixing == "weighted":
        return jax.nn.softmax(cat_logits, axis=-1)
    hard = jax.nn.one_hot(
        jnp.argmax(cat_logits, axis=-1), cat_logits.shape[-1], dtype=cat_logits.dtype
    )
    if mixing == "top1":
        return jax.lax.stop_gradient(hard)
    if mixing == "top1_st":
        soft = jax.nn.softmax(cat_logits, axis=-1)
        return soft + jax.lax.stop_gradient(hard - soft)
    raise ValueError(f"unknown mixing {mixing!r}")


def mix_heads(per_head: jax.Array, weights: jax.Array) -> jax.Array:
    """(B, C, D) head-bank outputs x (B, C) weights -> (B, D)."""
    return jnp.einsum("bcd,bc->bd", per_head, weights)


class JointCatPoseBDModel(nn.Module):
    """Variant 1: category fc on shared features + BD heads mixed by it."""

    num_classes: int = 12
    num_clusters: int = 200
    N0: int = 2048
    N1: int = 1000
    N2: int = 500
    N3: int = 100
    ndim: int = 3
    multires: bool = False
    mixing: str = "top1"
    feature_network: str = "resnet50"
    feature_layer: str = "layer4"
    dtype: Any = jnp.float32

    def setup(self):
        self.feature_model = make_backbone(
            self.feature_network, self.feature_layer, dtype=self.dtype
        )
        self.bin_models = MultiHeadMLP(
            num_heads=self.num_classes,
            features=(self.N1, self.N2, self.num_clusters),
            dtype=self.dtype,
            name="bin_models",
        )
        if self.multires:
            self.res_models = MultiHeadMLP(
                num_heads=self.num_classes * self.num_clusters,
                features=(self.N3, self.ndim),
                dtype=self.dtype,
                name="res_models",
            )
        else:
            self.res_models = MultiHeadMLP(
                num_heads=self.num_classes,
                features=(self.N1, self.N2, self.ndim),
                dtype=self.dtype,
                name="res_models",
            )
        self.fc = SharedMLP(features=(self.num_classes,), dtype=self.dtype, name="fc")

    def __call__(
        self, x: jax.Array, train: bool = False
    ) -> tuple[jax.Array, jax.Array, jax.Array]:
        feat = self.feature_model(x, train=train)
        cat_logits = self.fc(feat, train=train)
        per_head = self.bin_models(feat, train=train)  # (B, C, K)
        joint_bin = None
        if self.mixing == "joint_top1":
            # learnJointCatPoseModel_top1_new.py:110-118: the class (and,
            # for multires, the bin) comes from the argmax of the JOINT
            # posterior Plc = softmax_K(scores) * softmax_C(cat)[...,None],
            # selected by a detached one-hot (their CPU scatter) — no
            # gradient through the selection
            joint = jax.nn.softmax(per_head, axis=-1) * jax.nn.softmax(
                cat_logits, axis=-1
            )[:, :, None]
            flat_ind = jnp.argmax(joint.reshape(joint.shape[0], -1), axis=-1)
            ic = flat_ind // self.num_clusters
            joint_bin = flat_ind % self.num_clusters
            w = jax.lax.stop_gradient(
                jax.nn.one_hot(ic, self.num_classes, dtype=cat_logits.dtype)
            )
        else:
            w = class_weights(cat_logits, self.mixing)
        scores = mix_heads(per_head, w)  # (B, K)
        deltas = self.res_models(feat, train=train)
        if self.multires:
            b = deltas.shape[0]
            deltas = deltas.reshape(
                b, self.num_classes, self.num_clusters, self.ndim
            )
            # mix over classes, then pick the delta at the argmax bin —
            # joint_top1 uses the joint posterior's bin index instead
            # (_top1_new.py:128)
            deltas = jnp.einsum("bckd,bc->bkd", deltas, w)
            ind = jnp.argmax(scores, axis=-1) if joint_bin is None else joint_bin
            residual = jnp.take_along_axis(deltas, ind[:, None, None], axis=1)[:, 0]
        else:
            residual = mix_heads(deltas, w)
        return cat_logits, scores, residual

    def analysis(
        self, x: jax.Array, train: bool = False
    ) -> tuple[jax.Array, jax.Array, jax.Array]:
        """The evaluateJointModel.py wrapper forward (:82-104): category
        logits plus PER-CLASS bin-and-delta outputs — the offline analysis
        protocol decodes one pose per (sample, class), independent of the
        mixing mode (the script runs the same forward for all four
        checkpoints). Returns (cat_logits (B, C), per-class bin scores
        (B, C, K), per-class residuals (B, C, D)); multires residuals are
        selected by each class's OWN bin argmax (:92-98). Decode as
        centers[argmax(scores, -1)] + residuals (train.analysis)."""
        feat = self.feature_model(x, train=train)
        cat_logits = self.fc(feat, train=train)
        per_head = self.bin_models(feat, train=train)  # (B, C, K)
        deltas = self.res_models(feat, train=train)
        return cat_logits, per_head, _per_class_residuals(
            deltas, per_head, self.multires, self.num_classes,
            self.num_clusters, self.ndim,
        )


def _per_class_residuals(
    deltas: jax.Array, per_head: jax.Array, multires: bool,
    num_classes: int, num_clusters: int, ndim: int,
) -> jax.Array:
    """(B, C, D) per-class residuals for the analysis protocol; for
    multires banks ((B, C*K, D) stacked per class x cluster), each class's
    delta is the one at that class's own bin argmax
    (evaluateJointModel.py:89-98)."""
    if not multires:
        return deltas
    b = deltas.shape[0]
    deltas = deltas.reshape(b, num_classes, num_clusters, ndim)
    ind = jnp.argmax(per_head, axis=-1)  # (B, C)
    return jnp.take_along_axis(deltas, ind[..., None, None], axis=2)[:, :, 0]


class JointCatPoseBDModel2(nn.Module):
    """Variant 2: shared stage-1..3 trunk; pose branch = oracle layer4;
    category branch = a separate layer4 copy + fc.

    NOTE on the reference (learnJointCatPoseModel2_top1.py:92-138): the
    published script is internally inconsistent — it hardcodes N0=1024
    (:60) yet builds the oracle via binDeltaModels.OneBinDeltaModel, whose
    ctor always truncates at layer4 (N0=2048 features,
    binDeltaModels.py:106), so its `load_state_dict` / forward cannot run
    as published. This class implements the consistent construction its
    own pipeline products allow: split a standard layer4 BD oracle at
    layer3 (shared trunk below, oracle layer4 in the pose branch, heads at
    N0=2048) and graft a fresh torchvision layer4 + fc for category — the
    "separate layer4 branch for the category prediction" the forward's
    category path (:109-114) actually implements. models/surgery.py
    performs the split from a converted oracle checkpoint."""

    num_classes: int = 12
    num_clusters: int = 200
    N0: int = 2048
    N1: int = 1000
    N2: int = 500
    N3: int = 100
    ndim: int = 3
    multires: bool = False
    mixing: str = "weighted"
    arch: str = "resnet50"
    dtype: Any = jnp.float32

    def setup(self):
        # trunk: stem + stages 1..3, spatial output (shared by both branches)
        self.feature_trunk = ResNetBackbone(
            arch=self.arch, num_stages=3, pool=False, dtype=self.dtype,
            name="feature_trunk",
        )
        self.pose_stage = ResNetStage(
            arch=self.arch, stage=4, dtype=self.dtype, name="pose_stage"
        )
        self.category_stage = ResNetStage(
            arch=self.arch, stage=4, dtype=self.dtype, name="category_stage"
        )
        self.bin_models = MultiHeadMLP(
            num_heads=self.num_classes,
            features=(self.N1, self.N2, self.num_clusters),
            dtype=self.dtype,
            name="bin_models",
        )
        if self.multires:
            self.res_models = MultiHeadMLP(
                num_heads=self.num_classes * self.num_clusters,
                features=(self.N3, self.ndim),
                dtype=self.dtype,
                name="res_models",
            )
        else:
            self.res_models = MultiHeadMLP(
                num_heads=self.num_classes,
                features=(self.N1, self.N2, self.ndim),
                dtype=self.dtype,
                name="res_models",
            )
        self.fc = SharedMLP(features=(self.num_classes,), dtype=self.dtype, name="fc")

    def __call__(
        self, x: jax.Array, train: bool = False
    ) -> tuple[jax.Array, jax.Array, jax.Array]:
        trunk = self.feature_trunk(x, train=train)  # (B, 14, 14, 1024)
        cat_logits = self.fc(self.category_stage(trunk, train=train), train=train)
        w = class_weights(cat_logits, self.mixing)
        feat = self.pose_stage(trunk, train=train)  # (B, 2048)
        scores = mix_heads(self.bin_models(feat, train=train), w)
        deltas = self.res_models(feat, train=train)
        if self.multires:
            b = deltas.shape[0]
            deltas = deltas.reshape(b, self.num_classes, self.num_clusters, self.ndim)
            deltas = jnp.einsum("bckd,bc->bkd", deltas, w)
            ind = jnp.argmax(scores, axis=-1)
            residual = jnp.take_along_axis(deltas, ind[:, None, None], axis=1)[:, 0]
        else:
            residual = mix_heads(deltas, w)
        return cat_logits, scores, residual

    def analysis(
        self, x: jax.Array, train: bool = False
    ) -> tuple[jax.Array, jax.Array, jax.Array]:
        """The evaluateJointModel2.py wrapper forward (:85-115) under the
        runnable layer3-split construction (see the class docstring): the
        category branch reads the shared trunk through its own stage-4
        copy, the pose branch decodes per class — same analysis outputs as
        JointCatPoseBDModel.analysis."""
        trunk = self.feature_trunk(x, train=train)
        cat_logits = self.fc(self.category_stage(trunk, train=train), train=train)
        feat = self.pose_stage(trunk, train=train)
        per_head = self.bin_models(feat, train=train)
        deltas = self.res_models(feat, train=train)
        return cat_logits, per_head, _per_class_residuals(
            deltas, per_head, self.multires, self.num_classes,
            self.num_clusters, self.ndim,
        )


class JointCatPoseRegModel(nn.Module):
    """Variant 3: regression oracle + category fc; pose = pi*tanh(mixture)."""

    num_classes: int = 12
    N0: int = 2048
    N1: int = 1000
    N2: int = 500
    ndim: int = 3
    mixing: str = "top1"
    nonlinearity: str = "pi_tanh"
    feature_network: str = "resnet50"
    feature_layer: str = "layer4"
    dtype: Any = jnp.float32

    def setup(self):
        self.feature_model = make_backbone(
            self.feature_network, self.feature_layer, dtype=self.dtype
        )
        self.pose_models = MultiHeadMLP(
            num_heads=self.num_classes,
            features=(self.N1, self.N2, self.ndim),
            dtype=self.dtype,
            name="pose_models",
        )
        self.fc = SharedMLP(features=(self.num_classes,), dtype=self.dtype, name="fc")

    def __call__(
        self, x: jax.Array, train: bool = False
    ) -> tuple[jax.Array, jax.Array]:
        feat = self.feature_model(x, train=train)
        cat_logits = self.fc(feat, train=train)
        w = class_weights(cat_logits, self.mixing)
        # reference mixes raw head outputs then applies pi*tanh
        # (learnJointCatPoseModel3_top1.py:113-116)
        y = mix_heads(self.pose_models(feat, train=train), w)
        return cat_logits, apply_output_nonlinearity(y, self.nonlinearity)


class ElhoseinyBDModel(nn.Module):
    """Single-stage multi-task: class-agnostic BD + category linear head."""

    num_classes: int = 12
    num_clusters: int = 50
    N0: int = 2048
    N1: int = 1000
    N2: int = 500
    N3: int = 100
    ndim: int = 3
    feature_network: str = "resnet50"
    feature_layer: str = "layer4"
    dtype: Any = jnp.float32

    def setup(self):
        self.feature_model = make_backbone(
            self.feature_network, self.feature_layer, dtype=self.dtype
        )
        self.bin_model = SharedMLP(
            features=(self.N1, self.N2, self.num_clusters), dtype=self.dtype,
            name="bin_model",
        )
        self.res_models = MultiHeadMLP(
            num_heads=self.num_clusters,
            features=(self.N3, self.ndim),
            dtype=self.dtype,
            name="res_models",
        )
        self.category_model = SharedMLP(
            features=(self.num_classes,), dtype=self.dtype, name="category_model"
        )

    def __call__(
        self, x: jax.Array, train: bool = False
    ) -> tuple[jax.Array, jax.Array, jax.Array]:
        feat = self.feature_model(x, train=train)
        cat_logits = self.category_model(feat, train=train)
        scores = self.bin_model(feat, train=train)
        deltas = self.res_models(feat, train=train)  # (B, K, ndim)
        ind = jnp.argmax(scores, axis=-1)
        residual = jnp.take_along_axis(deltas, ind[:, None, None], axis=1)[:, 0]
        return cat_logits, scores, residual


class ElhoseinyRegressionModel(nn.Module):
    """Multi-task regression: shared pose head + category linear head."""

    num_classes: int = 12
    N0: int = 2048
    N1: int = 1000
    N2: int = 500
    ndim: int = 3
    nonlinearity: str = "pi_tanh"
    feature_network: str = "resnet50"
    feature_layer: str = "layer4"
    dtype: Any = jnp.float32

    def setup(self):
        self.feature_model = make_backbone(
            self.feature_network, self.feature_layer, dtype=self.dtype
        )
        self.pose_model = SharedMLP(
            features=(self.N1, self.N2, self.ndim),
            output_nonlinearity=self.nonlinearity,
            dtype=self.dtype,
            name="pose_model",
        )
        self.category_model = SharedMLP(
            features=(self.num_classes,), dtype=self.dtype, name="category_model"
        )

    def __call__(
        self, x: jax.Array, train: bool = False
    ) -> tuple[jax.Array, jax.Array]:
        feat = self.feature_model(x, train=train)
        return (
            self.category_model(feat, train=train),
            self.pose_model(feat, train=train),
        )
