"""Bin-and-delta pose models (backbone + vectorized per-class heads).

TPU-first re-design of binDeltaModels.py:99-178. Each model is a flax
module returning (scores, residual):

  OneBinDeltaModel           scores (B, K), residual (B, ndim)
  OneDeltaPerBinModel        scores (B, K), residual (B, ndim) at argmax bin
  ProbabilisticOneDeltaPerBinModel  scores (B, K), residuals (B, K, ndim)

All per-class / per-(class x cluster) head banks are single einsums (see
heads.MultiHeadMLP); class and bin selection are on-device gathers, not the
reference's CPU scatter + bmm round-trip (binDeltaModels.py:116-119,142-149).
"""

from __future__ import annotations

from typing import Any

import jax
import jax.numpy as jnp
from flax import linen as nn

from multi_modal_regression_tpu.models.backbones import make_backbone
from multi_modal_regression_tpu.models.heads import MultiHeadMLP, select_class


class OneBinDeltaModel(nn.Module):
    """Per-class bin head + per-class delta head (binDeltaModels.py:99-121).

    bin head:   bin_3layer(N0, N1, N2, num_clusters)
    delta head: res_3layer(N0, N1, N2, ndim)
    """

    num_classes: int = 12
    num_clusters: int = 200
    N0: int = 2048
    N1: int = 1000
    N2: int = 500
    ndim: int = 3
    feature_network: str = "resnet50"
    feature_layer: str = "layer4"
    dtype: Any = jnp.float32
    fused_bn: str | None = None  # fused conv+BN train path (ops.fused_conv_bn)
    stem_pool: str | None = None  # fused stem bn+relu+maxpool (ops.stem_pool)
    # restrict train-mode BN to these submodules; the rest run on running
    # stats even when train=True (the _rene fine-tune mix: model.eval() +
    # model.res_models.train(), learnSimpleBDModel_rene.py:133,148).
    bn_train_scope: tuple[str, ...] | None = None

    def setup(self):
        self.feature_model = make_backbone(
            self.feature_network, self.feature_layer, dtype=self.dtype,
            fused=self.fused_bn, stem_pool=self.stem_pool,
        )
        self.bin_models = MultiHeadMLP(
            num_heads=self.num_classes,
            features=(self.N1, self.N2, self.num_clusters),
            dtype=self.dtype,
            name="bin_models",
        )
        self.res_models = MultiHeadMLP(
            num_heads=self.num_classes,
            features=(self.N1, self.N2, self.ndim),
            dtype=self.dtype,
            name="res_models",
        )

    def _train_for(self, name: str, train: bool) -> bool:
        if self.bn_train_scope is None:
            return train
        return train and name in self.bn_train_scope

    def __call__(
        self, x: jax.Array, label: jax.Array, train: bool = False
    ) -> tuple[jax.Array, jax.Array]:
        feat = self.feature_model(x, train=self._train_for("feature_model", train))
        scores = select_class(
            self.bin_models(feat, train=self._train_for("bin_models", train)), label
        )
        residual = select_class(
            self.res_models(feat, train=self._train_for("res_models", train)), label
        )
        return scores, residual


class _DeltaPerBinBase(nn.Module):
    """Shared structure of the multires models (binDeltaModels.py:124-178).

    bin head:   per-class bin_3layer(N0, N1, N2, num_clusters)
    delta bank: one res_2layer(N0, N3, ndim) per (class, cluster) pair.
    """

    num_classes: int = 12
    num_clusters: int = 200
    N0: int = 2048
    N1: int = 1000
    N2: int = 500
    N3: int = 100
    ndim: int = 3
    feature_network: str = "resnet50"
    feature_layer: str = "layer4"
    dtype: Any = jnp.float32
    fused_bn: str | None = None  # fused conv+BN train path (ops.fused_conv_bn)
    stem_pool: str | None = None  # fused stem bn+relu+maxpool (ops.stem_pool)

    def setup(self):
        self.feature_model = make_backbone(
            self.feature_network, self.feature_layer, dtype=self.dtype,
            fused=self.fused_bn, stem_pool=self.stem_pool,
        )
        self.bin_models = MultiHeadMLP(
            num_heads=self.num_classes,
            features=(self.N1, self.N2, self.num_clusters),
            dtype=self.dtype,
            name="bin_models",
        )
        self.res_models = MultiHeadMLP(
            num_heads=self.num_classes * self.num_clusters,
            features=(self.N3, self.ndim),
            dtype=self.dtype,
            name="res_models",
        )

    def _scores_and_all_deltas(
        self, x: jax.Array, label: jax.Array, train: bool
    ) -> tuple[jax.Array, jax.Array]:
        feat = self.feature_model(x, train=train)
        scores = select_class(self.bin_models(feat, train=train), label)  # (B, K)
        deltas = self.res_models(feat, train=train)  # (B, C*K, ndim)
        b = deltas.shape[0]
        deltas = deltas.reshape(b, self.num_classes, self.num_clusters, self.ndim)
        deltas = jnp.take_along_axis(deltas, label[:, None, None, None], axis=1)[:, 0]
        return scores, deltas  # (B, K), (B, K, ndim)


class OneDeltaPerBinModel(_DeltaPerBinBase):
    """Multires BD: the returned delta is the one at the argmax bin
    (binDeltaModels.py:146-149); no gradient flows through the selection."""

    def __call__(
        self, x: jax.Array, label: jax.Array, train: bool = False
    ) -> tuple[jax.Array, jax.Array]:
        scores, deltas = self._scores_and_all_deltas(x, label, train)
        ind = jnp.argmax(scores, axis=-1)
        residual = jnp.take_along_axis(deltas, ind[:, None, None], axis=1)[:, 0]
        return scores, residual


class ProbabilisticOneDeltaPerBinModel(_DeltaPerBinBase):
    """Multires BD returning ALL per-cluster deltas (B, K, ndim) for
    expected-loss training (binDeltaModels.py:154-178)."""

    def __call__(
        self, x: jax.Array, label: jax.Array, train: bool = False
    ) -> tuple[jax.Array, jax.Array]:
        return self._scores_and_all_deltas(x, label, train)
