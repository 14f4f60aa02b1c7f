"""Batch normalization with torch running-statistics semantics.

torch's ``nn.BatchNorm1d/2d`` (all reference models: featureModels.py wraps
torchvision ResNet/VGG modules; head stacks build ``nn.BatchNorm1d`` —
binDeltaModels.py:16-91, poseModels.py:10-51) normalizes the batch with the
BIASED batch variance but updates ``running_var`` with the
Bessel-corrected (UNBIASED) variance, i.e. ``var * n / (n - 1)`` where n is
the per-feature reduction count. flax's ``nn.BatchNorm`` uses the biased
variance for both, so its running variance converges to a value smaller by
a factor (n-1)/n. Train-mode forward/backward are identical; the difference
surfaces wherever running statistics are consumed — the reference's
``testing()`` runs ``model.eval()`` (learnGeodesicBDModel.py:209), and the
snapshot-ensemble evaluation protocol scores eval-mode snapshots — so exact
reference parity requires the torch update rule. The gap is ~1/n: invisible
for backbone BNs (n = B*H*W ~ 1e5) but ~1% of the variance for the
head-bank BNs (n = batch).

``TorchBatchNorm`` mirrors ``flax.linen.BatchNorm.__call__`` (flax
normalization.py, Apache-2.0) exactly except for the one-line Bessel
correction, so forward numerics and the variable tree are unchanged and
checkpoints are interchangeable.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
from flax.linen import module
from flax.linen.module import compact
from flax.linen.normalization import (
    BatchNorm,
    _canonicalize_axes,
    _compute_stats,
    _normalize,
)


def bessel_factor(count) -> float:
    """n/(n-1) as an exact python double; 1.0 for n <= 1 (torch returns NaN
    there, but a 1-element batch never reaches BN training in any reference
    config). `count` is always a static reduction count derived from shapes,
    so this stays a compile-time scalar; as a weak-typed double it matches
    torch's update (double scalar, one rounding at the multiply) in BOTH
    f32 and the x64 parity harness's f64."""
    n = int(count)
    return n / (n - 1) if n > 1 else 1.0


class TorchBatchNorm(BatchNorm):
    """flax BatchNorm with torch's unbiased running-variance update.

    Identical to ``nn.BatchNorm`` in train/eval forward math, parameter and
    batch_stats trees, and dtype handling; only the running-variance EMA
    feeds ``batch_var * n/(n-1)`` (aten native_batch_norm semantics) instead
    of the biased ``batch_var``. ``axis_name`` cross-device stats are not
    supported (the local reduction count would undercount n); all call
    sites in this package use per-device statistics.
    """

    @compact
    def __call__(
        self,
        x,
        use_running_average: bool | None = None,
        *,
        mask: jax.Array | None = None,
    ):
        if self.axis_name is not None:
            raise NotImplementedError(
                "TorchBatchNorm: axis_name stats would miscount the Bessel n"
            )
        use_running_average = module.merge_param(
            "use_running_average", self.use_running_average, use_running_average
        )
        feature_axes = _canonicalize_axes(x.ndim, self.axis)
        reduction_axes = tuple(i for i in range(x.ndim) if i not in feature_axes)
        feature_shape = [x.shape[ax] for ax in feature_axes]

        ra_mean = self.variable(
            "batch_stats",
            "mean",
            lambda s: jnp.zeros(
                s,
                jnp.float32 if self.force_float32_reductions else self.param_dtype,
            ),
            feature_shape,
        )
        ra_var = self.variable(
            "batch_stats",
            "var",
            lambda s: jnp.ones(
                s,
                jnp.float32 if self.force_float32_reductions else self.param_dtype,
            ),
            feature_shape,
        )

        if use_running_average:
            mean = (
                ra_mean.value
                if self.force_float32_reductions
                else jnp.asarray(ra_mean.value, self.param_dtype)
            )
            var = (
                ra_var.value
                if self.force_float32_reductions
                else jnp.asarray(ra_var.value, self.param_dtype)
            )
        else:
            mean, var = _compute_stats(
                x,
                reduction_axes,
                dtype=self.dtype,
                axis_name=None,
                axis_index_groups=self.axis_index_groups,
                use_fast_variance=self.use_fast_variance,
                mask=mask,
                force_float32_reductions=self.force_float32_reductions,
            )

            if not self.is_initializing():
                n = 1
                for ax in reduction_axes:
                    n *= x.shape[ax]
                m = self.momentum
                ra_mean.value = m * ra_mean.value + (1 - m) * mean
                ra_var.value = m * ra_var.value + (1 - m) * (
                    var * bessel_factor(n)
                )

        return _normalize(
            self,
            x,
            mean,
            var,
            reduction_axes,
            feature_axes,
            self.dtype,
            self.param_dtype,
            self.epsilon,
            self.use_bias,
            self.use_scale,
            self.bias_init,
            self.scale_init,
            self.force_float32_reductions,
        )
