"""Vectorized MLP pose heads.

The reference holds per-class (and per-class-per-cluster) heads in
nn.ModuleLists and loops over them in Python, stacking the results and
selecting by a CPU one-hot scatter + bmm (binDeltaModels.py:109-119).
Here every bank of H parallel heads is ONE parameter tensor per layer,
applied with a single einsum — a batched matmul that tiles straight onto
the MXU with no per-head dispatch, and class selection is an on-device
one-hot contraction (no host round-trip).

Layer recipe matches the reference blocks (binDeltaModels.py:16-91,
poseModels.py:10-51, quaternion.py:101-142): hidden layers are
Linear(bias=False) + BatchNorm + ReLU; the final layer is a plain Linear
with bias, optionally followed by an output nonlinearity:

  'none'     raw scores / residuals (bin_*, res_*, model_3layer, model_1layer)
  'tanh'     model_2layer (poseModels.py:38)
  'pi_tanh'  pi * tanh  (regression 'valid', learnGeodesicRegressionModel.py:102)
  'my_proj'  angle-fmod projection onto the pi-ball ('correct', :76-80,104)
  'quat'     L2-normalize(tanh) unit quaternion (quaternion.py:114,122-142)

BatchNorm in a head bank is per-(head, feature) over the batch axis —
exactly what each per-class BatchNorm1d sees in the reference, since every
head there processes the full batch before selection.
"""

from __future__ import annotations

import math
from typing import Any, Sequence

import jax
import jax.numpy as jnp
from flax import linen as nn

from multi_modal_regression_tpu import EPS
from multi_modal_regression_tpu.models.norm import TorchBatchNorm


def torch_linear_init(fan_in: int):
    """torch.nn.Linear default init: U(-1/sqrt(fan_in), 1/sqrt(fan_in))."""
    bound = 1.0 / math.sqrt(fan_in)

    def init(key, shape, dtype=jnp.float32):
        return jax.random.uniform(key, shape, dtype, -bound, bound)

    return init


def apply_output_nonlinearity(y: jax.Array, kind: str) -> jax.Array:
    """Output nonlinearities shared by the pose-head zoo (see module doc)."""
    if kind == "none":
        return y
    if kind == "tanh":
        return jnp.tanh(y)
    if kind == "pi_tanh":
        return jnp.pi * jnp.tanh(y)
    if kind == "my_proj":
        # angle = fmod(|y|, pi), axis = y/|y| (learnGeodesicRegressionModel.py:76-80)
        sq = jnp.sum(y * y, axis=-1, keepdims=True)
        norm = jnp.sqrt(jnp.maximum(sq, EPS * EPS))
        angle = jnp.fmod(norm, jnp.pi)
        return jnp.where(sq <= EPS * EPS, jnp.zeros_like(y), angle * y / norm)
    if kind == "quat":
        # F.normalize(F.tanh(y)): torch normalize clamps the norm at 1e-12.
        t = jnp.tanh(y)
        norm = jnp.sqrt(jnp.maximum(jnp.sum(t * t, axis=-1, keepdims=True), 1e-24))
        return t / jnp.maximum(norm, 1e-12)
    raise ValueError(f"unknown output nonlinearity {kind!r}")


class MultiHeadMLP(nn.Module):
    """A bank of `num_heads` parallel MLPs over shared input features.

    Input:  (B, F) features shared by all heads, or (B, H, F) per-head.
    Output: (B, H, out_dim).

    `features` lists hidden dims then the output dim, e.g. the reference
    bin_3layer(N0, N1, N2, K) is MultiHeadMLP(features=(N1, N2, K)).
    An empty hidden list ((K,)) reproduces bin_1layer/res_1layer.
    """

    num_heads: int
    features: Sequence[int]
    output_nonlinearity: str = "none"
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x: jax.Array, train: bool = False) -> jax.Array:
        # Internal layout is heads-leading (H, B, F): XLA emits clean batched
        # GEMMs for (H,B,I)x(H,I,O) contractions, where the heads-middle
        # einsum 'bhi,hio->bho' lowers to a dilated-convolution backward
        # that moves ~8x the minimal HBM bytes (measured in the train-step
        # xplane profile, BASELINE.md round 2).
        shared_input = x.ndim == 2
        if not shared_input:
            x = jnp.transpose(x, (1, 0, 2))  # (B, H, F) -> (H, B, F)
        x = x.astype(self.dtype)
        dims = tuple(self.features)
        for li, out_dim in enumerate(dims):
            fan_in = x.shape[-1]
            last = li == len(dims) - 1
            kernel = self.param(
                f"fc{li + 1}_kernel",
                torch_linear_init(fan_in),
                (self.num_heads, fan_in, out_dim),
            ).astype(self.dtype)
            if li == 0 and shared_input:
                # shared features: contract (B, I) x (H, I, O) -> (H, B, O)
                # directly — no transposed/reshaped weight copy (a per-step
                # 49 MB materialization whose gradient untranspose tripled
                # the backward cost when tried)
                x = jax.lax.dot_general(
                    x, kernel,
                    dimension_numbers=(((1,), (1,)), ((), ())),
                    preferred_element_type=self.dtype,
                )  # (B, H, O)
                x = jnp.transpose(x, (1, 0, 2))  # (H, B, O)
            else:
                # per-head inputs: batched GEMM with heads as the batch dim
                x = jax.lax.dot_general(
                    x, kernel,
                    dimension_numbers=(((2,), (1,)), ((0,), (0,))),
                    preferred_element_type=self.dtype,
                )  # (H, B, O)
            if last:
                bias = self.param(
                    f"fc{li + 1}_bias", torch_linear_init(fan_in),
                    (self.num_heads, out_dim),
                ).astype(self.dtype)
                x = x + bias[:, None, :]
            else:
                x = TorchBatchNorm(
                    use_running_average=not train,
                    momentum=0.9,
                    epsilon=1e-5,
                    axis=(0, -1),  # per-(head, feature) stats over the batch
                    dtype=self.dtype,
                    name=f"bn{li + 1}",
                )(x)
                x = nn.relu(x)
        x = jnp.transpose(x, (1, 0, 2))  # back to (B, H, out)
        # outputs feed the loss in at-least-f32 (promote keeps f64 for
        # the x64 parity harness)
        return apply_output_nonlinearity(
            x.astype(jnp.promote_types(jnp.float32, x.dtype)),
            self.output_nonlinearity,
        )


class SharedMLP(nn.Module):
    """A single MLP head (class-agnostic / label-concat models).

    Same layer recipe as MultiHeadMLP with num_heads=1 but without the head
    axis: (B, F) -> (B, out_dim). Used by the Independent* models
    (learnIndependentBDModel.py:88-111) and the ObjectNet label-concat
    models (objectnetHelperFunctions.py:155-231).
    """

    features: Sequence[int]
    output_nonlinearity: str = "none"
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x: jax.Array, train: bool = False) -> jax.Array:
        x = x.astype(self.dtype)
        dims = tuple(self.features)
        for li, out_dim in enumerate(dims):
            fan_in = x.shape[-1]
            last = li == len(dims) - 1
            x = nn.Dense(
                out_dim,
                use_bias=last,
                kernel_init=torch_linear_init(fan_in),
                bias_init=torch_linear_init(fan_in),
                dtype=self.dtype,
                name=f"fc{li + 1}",
            )(x)
            if not last:
                x = TorchBatchNorm(
                    use_running_average=not train, momentum=0.9, epsilon=1e-5,
                    dtype=self.dtype, name=f"bn{li + 1}",
                )(x)
                x = nn.relu(x)
        return apply_output_nonlinearity(
            x.astype(jnp.promote_types(jnp.float32, x.dtype)),
            self.output_nonlinearity,
        )


def select_class(per_head: jax.Array, label: jax.Array) -> jax.Array:
    """Pick each sample's head output: (B, H, D), (B,) int -> (B, D).

    On-device replacement for the reference's CPU one-hot scatter + bmm
    (binDeltaModels.py:116-119).
    """
    return jnp.take_along_axis(per_head, label[:, None, None], axis=1)[:, 0]
