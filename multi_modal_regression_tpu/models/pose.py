"""Regression / classification / class-agnostic / label-concat pose models.

Covers the non-bin-delta half of the reference model zoo:

  PerClassRegressionModel      per-class model_3layer heads, output
                               nonlinearity 'none' | 'pi_tanh' ('valid') |
                               'my_proj' ('correct') | 'quat'
                               (learnGeodesicRegressionModel.py:84-107,
                                learnGeodesicRegression_quaternion.py:75-95)
  PerClassClassificationModel  per-class bin_3layer heads, bins only
                               (learnClassificationModel.py:71-89)
  IndependentRegressionModel   single shared head, pi*tanh
                               (learnIndependentRegressionModel.py:74-88)
  IndependentBDModel           shared bin head + per-cluster delta heads,
                               class-agnostic (learnIndependentBDModel.py:88-111,
                                learnRenderedBDModel.py:88-111)
  CategorizationModel          12-way object-category classifier
                               (learnCategorizationModel.py; backbone freezing
                                is an optimizer concern, see train/)
  LabelConcat*                 ObjectNet3D-style models: features concat
                               one-hot(class) -> single shared head
                               (objectnetHelperFunctions.py:155-231)
"""

from __future__ import annotations

from typing import Any

import jax
import jax.numpy as jnp
from flax import linen as nn

from multi_modal_regression_tpu.models.backbones import make_backbone
from multi_modal_regression_tpu.models.heads import (
    MultiHeadMLP,
    SharedMLP,
    apply_output_nonlinearity,
    select_class,
)


class _BackboneModel(nn.Module):
    """Common fields + backbone construction."""

    num_classes: int = 12
    N0: int = 2048
    N1: int = 1000
    N2: int = 500
    feature_network: str = "resnet50"
    feature_layer: str = "layer4"
    dtype: Any = jnp.float32

    def _backbone(self):
        return make_backbone(self.feature_network, self.feature_layer, dtype=self.dtype)


class PerClassRegressionModel(_BackboneModel):
    """Per-class 3-layer pose heads; pure regression (no bins)."""

    ndim: int = 3
    nonlinearity: str = "pi_tanh"  # 'none' | 'pi_tanh' | 'my_proj' | 'quat'

    def setup(self):
        self.feature_model = self._backbone()
        self.pose_models = MultiHeadMLP(
            num_heads=self.num_classes,
            features=(self.N1, self.N2, self.ndim),
            dtype=self.dtype,
            name="pose_models",
        )

    def __call__(self, x: jax.Array, label: jax.Array, train: bool = False) -> jax.Array:
        feat = self.feature_model(x, train=train)
        y = select_class(self.pose_models(feat, train=train), label)
        # the reference applies the nonlinearity after class selection
        # (learnGeodesicRegressionModel.py:100-105) — elementwise, so equal.
        return apply_output_nonlinearity(y, self.nonlinearity)


class PerClassClassificationModel(_BackboneModel):
    """Per-class bin heads; prediction is the dictionary atom at argmax."""

    num_clusters: int = 100

    def setup(self):
        self.feature_model = self._backbone()
        self.pose_models = MultiHeadMLP(
            num_heads=self.num_classes,
            features=(self.N1, self.N2, self.num_clusters),
            dtype=self.dtype,
            name="pose_models",
        )

    def __call__(self, x: jax.Array, label: jax.Array, train: bool = False) -> jax.Array:
        feat = self.feature_model(x, train=train)
        return select_class(self.pose_models(feat, train=train), label)


class IndependentRegressionModel(_BackboneModel):
    """One shared (class-agnostic) pose head, pi*tanh output."""

    ndim: int = 3
    nonlinearity: str = "pi_tanh"

    def setup(self):
        self.feature_model = self._backbone()
        self.pose_model = SharedMLP(
            features=(self.N1, self.N2, self.ndim),
            output_nonlinearity=self.nonlinearity,
            dtype=self.dtype,
            name="pose_model",
        )

    def __call__(self, x: jax.Array, train: bool = False) -> jax.Array:
        return self.pose_model(self.feature_model(x, train=train), train=train)


class IndependentBDModel(_BackboneModel):
    """Class-agnostic BD: one bin head + one delta head per cluster; the
    returned delta is the one at the argmax bin."""

    num_clusters: int = 50
    N3: int = 100
    ndim: int = 3

    def setup(self):
        self.feature_model = self._backbone()
        self.bin_model = SharedMLP(
            features=(self.N1, self.N2, self.num_clusters),
            dtype=self.dtype,
            name="bin_model",
        )
        self.res_models = MultiHeadMLP(
            num_heads=self.num_clusters,
            features=(self.N3, self.ndim),
            dtype=self.dtype,
            name="res_models",
        )

    def __call__(self, x: jax.Array, train: bool = False) -> tuple[jax.Array, jax.Array]:
        feat = self.feature_model(x, train=train)
        scores = self.bin_model(feat, train=train)  # (B, K)
        deltas = self.res_models(feat, train=train)  # (B, K, ndim)
        ind = jnp.argmax(scores, axis=-1)
        residual = jnp.take_along_axis(deltas, ind[:, None, None], axis=1)[:, 0]
        return scores, residual


class CategorizationModel(_BackboneModel):
    """Object-category classifier over the backbone features (12-way)."""

    def setup(self):
        self.feature_model = self._backbone()
        self.category_model = SharedMLP(
            features=(self.num_classes,), dtype=self.dtype, name="category_model"
        )

    def __call__(self, x: jax.Array, train: bool = False) -> jax.Array:
        return self.category_model(self.feature_model(x, train=train), train=train)


class _LabelConcatBase(_BackboneModel):
    """ObjectNet3D base: backbone features concat one-hot class label."""

    def _features(self, x: jax.Array, label: jax.Array, train: bool) -> jax.Array:
        feat = self.feature_model(x, train=train)
        onehot = jax.nn.one_hot(label, self.num_classes, dtype=feat.dtype)
        return jnp.concatenate([feat, onehot], axis=-1)


class LabelConcatBDModel(_LabelConcatBase):
    """objectnetHelperFunctions.OneBinDeltaModel:155-172."""

    num_clusters: int = 200
    ndim: int = 3

    def setup(self):
        self.feature_model = self._backbone()
        self.bin_model = SharedMLP(
            features=(self.N1, self.N2, self.num_clusters), dtype=self.dtype,
            name="bin_model",
        )
        self.res_model = SharedMLP(
            features=(self.N1, self.N2, self.ndim), dtype=self.dtype,
            name="res_model",
        )

    def __call__(
        self, x: jax.Array, label: jax.Array, train: bool = False
    ) -> tuple[jax.Array, jax.Array]:
        z = self._features(x, label, train)
        return self.bin_model(z, train=train), self.res_model(z, train=train)


class LabelConcatDeltaPerBinModel(_LabelConcatBase):
    """objectnetHelperFunctions.OneDeltaPerBinModel:175-198."""

    num_clusters: int = 16
    N3: int = 100
    ndim: int = 3

    def setup(self):
        self.feature_model = self._backbone()
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

    def __call__(
        self, x: jax.Array, label: jax.Array, train: bool = False
    ) -> tuple[jax.Array, jax.Array]:
        z = self._features(x, label, train)
        scores = self.bin_model(z, train=train)
        deltas = self.res_models(z, train=train)
        ind = jnp.argmax(scores, axis=-1)
        residual = jnp.take_along_axis(deltas, ind[:, None, None], axis=1)[:, 0]
        return scores, residual


class LabelConcatRegressionModel(_LabelConcatBase):
    """objectnetHelperFunctions.RegressionModel:201-215 (pi*tanh output)."""

    ndim: int = 3
    nonlinearity: str = "pi_tanh"

    def setup(self):
        self.feature_model = self._backbone()
        self.pose_model = SharedMLP(
            features=(self.N1, self.N2, self.ndim),
            output_nonlinearity=self.nonlinearity,
            dtype=self.dtype,
            name="pose_model",
        )

    def __call__(self, x: jax.Array, label: jax.Array, train: bool = False) -> jax.Array:
        return self.pose_model(self._features(x, label, train), train=train)


class LabelConcatClassificationModel(_LabelConcatBase):
    """objectnetHelperFunctions.ClassificationModel:218-231 (bins only)."""

    num_clusters: int = 16

    def setup(self):
        self.feature_model = self._backbone()
        self.pose_model = SharedMLP(
            features=(self.N1, self.N2, self.num_clusters), dtype=self.dtype,
            name="pose_model",
        )

    def __call__(self, x: jax.Array, label: jax.Array, train: bool = False) -> jax.Array:
        return self.pose_model(self._features(x, label, train), train=train)
