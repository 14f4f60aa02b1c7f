"""Convolutional feature backbones (flax.linen, NHWC, TPU-friendly).

Re-design of the reference's backbone wrappers (featureModels.py:11-67):
ResNet50/101 truncated after stage 2/3/4 with a global average pool, and
VGG13/16-bn truncated at fc6/fc7. Differences from the reference, by design:

  - NHWC layout and a configurable compute dtype (bfloat16 on TPU); params
    and batch statistics stay float32.
  - Explicit torch-style convolution padding (not 'SAME') so that weights
    converted from torchvision checkpoints produce identical activations.
  - Global mean pool instead of fixed-size AvgPool2d(pool_size): identical
    for 224x224 inputs (featureModels.py:23-35 picks the pool size to cover
    the full spatial extent) but shape-polymorphic.

Feature dims match the reference table (featureModels.py:23-33):
  stage 4 -> 2048, stage 3 -> 1024, stage 2 -> 512 (bottleneck ResNets).
"""

from __future__ import annotations

from typing import Any, Sequence

import jax
import jax.numpy as jnp
from flax import linen as nn

# (stage_sizes, bottleneck) per architecture, torchvision naming.
RESNET_CONFIGS: dict[str, tuple[tuple[int, ...], bool]] = {
    "resnet18": ((2, 2, 2, 2), False),
    "resnet34": ((3, 4, 6, 3), False),
    "resnet50": ((3, 4, 6, 3), True),
    "resnet101": ((3, 4, 23, 3), True),
    "resnet152": ((3, 8, 36, 3), True),
}

# VGG feature stack configs (torchvision convention; 'M' = 2x2 max pool).
VGG_CONFIGS: dict[str, tuple[Any, ...]] = {
    "vgg13": (64, 64, "M", 128, 128, "M", 256, 256, "M", 512, 512, "M", 512, 512, "M"),
    "vgg16": (64, 64, "M", 128, 128, "M", 256, 256, 256, "M", 512, 512, 512, "M",
              512, 512, 512, "M"),
}


def _conv(features: int, kernel: int, stride: int, pad: int, dtype, name: str):
    """Bias-free conv with explicit symmetric padding (torch semantics)."""
    return nn.Conv(
        features,
        (kernel, kernel),
        strides=(stride, stride),
        padding=((pad, pad), (pad, pad)),
        use_bias=False,
        dtype=dtype,
        name=name,
    )


def _bn(train: bool, dtype, name: str):
    """BatchNorm with torch defaults (eps=1e-5, running-stat decay 0.1)."""
    return nn.BatchNorm(
        use_running_average=not train,
        momentum=0.9,
        epsilon=1e-5,
        dtype=dtype,
        name=name,
    )


class BasicBlock(nn.Module):
    """ResNet18/34 residual block: 3x3 -> 3x3 with identity shortcut."""

    features: int
    stride: int = 1
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x: jax.Array, train: bool) -> jax.Array:
        residual = x
        y = _conv(self.features, 3, self.stride, 1, self.dtype, "conv1")(x)
        y = _bn(train, self.dtype, "bn1")(y)
        y = nn.relu(y)
        y = _conv(self.features, 3, 1, 1, self.dtype, "conv2")(y)
        y = _bn(train, self.dtype, "bn2")(y)
        if residual.shape != y.shape:
            residual = _conv(self.features, 1, self.stride, 0, self.dtype, "downsample_conv")(x)
            residual = _bn(train, self.dtype, "downsample_bn")(residual)
        return nn.relu(y + residual)


class BottleneckBlock(nn.Module):
    """ResNet50/101 bottleneck (torchvision v1.5: stride on the 3x3 conv)."""

    features: int  # bottleneck width; output channels = 4 * features
    stride: int = 1
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x: jax.Array, train: bool) -> jax.Array:
        residual = x
        y = _conv(self.features, 1, 1, 0, self.dtype, "conv1")(x)
        y = _bn(train, self.dtype, "bn1")(y)
        y = nn.relu(y)
        y = _conv(self.features, 3, self.stride, 1, self.dtype, "conv2")(y)
        y = _bn(train, self.dtype, "bn2")(y)
        y = nn.relu(y)
        y = _conv(4 * self.features, 1, 1, 0, self.dtype, "conv3")(y)
        y = _bn(train, self.dtype, "bn3")(y)
        if residual.shape != y.shape:
            residual = _conv(4 * self.features, 1, self.stride, 0, self.dtype, "downsample_conv")(x)
            residual = _bn(train, self.dtype, "downsample_bn")(residual)
        return nn.relu(y + residual)


class ResNetBackbone(nn.Module):
    """ResNet feature extractor truncated after `num_stages` residual stages.

    num_stages=4 is the reference 'layer4' (2048-d), 3 -> 'layer3' (1024-d),
    2 -> 'layer2' (512-d) (featureModels.py:23-33). Output: (B, feature_dim)
    after a global average pool over the spatial dims.
    """

    arch: str = "resnet50"
    num_stages: int = 4
    pool: bool = True  # False -> return spatial (B, H, W, C) pre-pool features
    dtype: Any = jnp.float32

    @property
    def feature_dim(self) -> int:
        stage_sizes, bottleneck = RESNET_CONFIGS[self.arch]
        del stage_sizes
        width = 64 * 2 ** (self.num_stages - 1)
        return width * 4 if bottleneck else width

    @nn.compact
    def __call__(self, x: jax.Array, train: bool = False) -> jax.Array:
        if not 2 <= self.num_stages <= 4:
            raise ValueError(f"num_stages must be in [2, 4], got {self.num_stages}")
        stage_sizes, bottleneck = RESNET_CONFIGS[self.arch]
        block_cls = BottleneckBlock if bottleneck else BasicBlock

        x = x.astype(self.dtype)
        x = _conv(64, 7, 2, 3, self.dtype, "conv1")(x)
        x = _bn(train, self.dtype, "bn1")(x)
        x = nn.relu(x)
        x = nn.max_pool(x, (3, 3), strides=(2, 2), padding=((1, 1), (1, 1)))

        for stage in range(self.num_stages):
            width = 64 * 2**stage
            for block in range(stage_sizes[stage]):
                stride = 2 if stage > 0 and block == 0 else 1
                x = block_cls(
                    features=width,
                    stride=stride,
                    dtype=self.dtype,
                    name=f"layer{stage + 1}_{block}",
                )(x, train)

        if not self.pool:
            return x
        # Global average pool (== AvgPool2d(full extent) for 224 inputs,
        # featureModels.py:35) -> (B, C). Accumulate the mean in float32.
        x = jnp.mean(x.astype(jnp.float32), axis=(1, 2))
        return x


class ResNetStage(nn.Module):
    """One standalone residual stage (e.g. a separate 'layer4' branch).

    Used by the joint cat+pose variant-2 models, which share a stage-1..3
    trunk but run a second copy of layer4 for the category branch
    (learnJointCatPoseModel2_weighted.py:92-117). Block names match
    ResNetBackbone's (`layer<stage>_<i>`) so oracle backbone params can be
    grafted in directly.
    """

    arch: str = "resnet50"
    stage: int = 4  # 1-indexed stage number
    pool: bool = True
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x: jax.Array, train: bool = False) -> jax.Array:
        stage_sizes, bottleneck = RESNET_CONFIGS[self.arch]
        block_cls = BottleneckBlock if bottleneck else BasicBlock
        width = 64 * 2 ** (self.stage - 1)
        x = x.astype(self.dtype)
        for block in range(stage_sizes[self.stage - 1]):
            stride = 2 if self.stage > 1 and block == 0 else 1
            x = block_cls(
                features=width, stride=stride, dtype=self.dtype,
                name=f"layer{self.stage}_{block}",
            )(x, train)
        if self.pool:
            x = jnp.mean(x.astype(jnp.float32), axis=(1, 2))
        return x


class VGGBackbone(nn.Module):
    """VGG13/16-bn feature stack + truncated classifier (fc6 or fc7).

    Mirrors featureModels.py:44-67: fc6 -> Linear(25088, 4096) + ReLU;
    fc7 additionally Dropout + Linear(4096, 4096) + ReLU. Output: (B, 4096).
    """

    arch: str = "vgg13"
    layer: str = "fc6"  # 'fc6' | 'fc7'
    dtype: Any = jnp.float32

    feature_dim: int = 4096

    @nn.compact
    def __call__(self, x: jax.Array, train: bool = False) -> jax.Array:
        if self.layer not in ("fc6", "fc7"):
            raise ValueError(f"layer must be fc6|fc7, got {self.layer!r}")
        cfg: Sequence[Any] = VGG_CONFIGS[self.arch]
        x = x.astype(self.dtype)
        conv_idx = 0
        for v in cfg:
            if v == "M":
                x = nn.max_pool(x, (2, 2), strides=(2, 2))
            else:
                x = nn.Conv(
                    int(v), (3, 3), padding=((1, 1), (1, 1)), use_bias=True,
                    dtype=self.dtype, name=f"conv{conv_idx}",
                )(x)
                x = _bn(train, self.dtype, f"bn{conv_idx}")(x)
                x = nn.relu(x)
                conv_idx += 1
        # torch flattens NCHW (C-major); transpose so converted fc6 weights
        # see the same element order from our NHWC activations.
        b, h, w, c = x.shape
        x = jnp.transpose(x, (0, 3, 1, 2)).reshape(b, c * h * w)
        x = nn.Dense(4096, dtype=self.dtype, name="fc6")(x)
        x = nn.relu(x)
        if self.layer == "fc7":
            x = nn.Dropout(0.5, deterministic=not train)(x)
            x = nn.Dense(4096, dtype=self.dtype, name="fc7")(x)
            x = nn.relu(x)
        return x.astype(jnp.float32)


def make_backbone(name: str, layer: str, dtype: Any = jnp.float32) -> nn.Module:
    """Factory matching the reference's (model_type, layer_type) interface.

    name in RESNET_CONFIGS with layer 'layer2'|'layer3'|'layer4', or
    name in VGG_CONFIGS with layer 'fc6'|'fc7'.
    """
    if name in RESNET_CONFIGS:
        return ResNetBackbone(arch=name, num_stages=int(layer[-1]), dtype=dtype)
    if name in VGG_CONFIGS:
        return VGGBackbone(arch=name, layer=layer, dtype=dtype)
    raise ValueError(f"unknown backbone {name!r}")
