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

from multi_modal_regression_tpu.models.norm import TorchBatchNorm, bessel_factor

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
    """BatchNorm with torch defaults (eps=1e-5, running-stat decay 0.1) and
    torch's Bessel-corrected running-variance update (models/norm.py)."""
    return TorchBatchNorm(
        use_running_average=not train,
        momentum=0.9,
        epsilon=1e-5,
        dtype=dtype,
        name=name,
    )


class _ConvKernel(nn.Module):
    """Parameter holder producing the same tree as nn.Conv (<name>/kernel).

    Used by the fused conv+BN path so fused and unfused checkpoints are
    interchangeable (same names, shapes, and lecun_normal init).
    """

    shape: tuple[int, ...]

    @nn.compact
    def __call__(self) -> jax.Array:
        return self.param("kernel", nn.initializers.lecun_normal(), self.shape)


class _BNState(nn.Module):
    """Parameter/stat holder matching nn.BatchNorm's tree
    (<name>/{scale,bias} + batch_stats <name>/{mean,var}), with torch's
    Bessel-corrected running-variance update (momentum 0.9, like _bn above;
    `count` is the per-feature reduction count n the biased batch_var was
    computed over)."""

    features: int
    momentum: float = 0.9

    @nn.compact
    def __call__(self, batch_mean=None, batch_var=None, count=None):
        scale = self.param("scale", nn.initializers.ones, (self.features,))
        bias = self.param("bias", nn.initializers.zeros, (self.features,))
        ra_mean = self.variable(
            "batch_stats", "mean",
            lambda: jnp.zeros((self.features,), jnp.float32),
        )
        ra_var = self.variable(
            "batch_stats", "var",
            lambda: jnp.ones((self.features,), jnp.float32),
        )
        if batch_mean is not None and not self.is_initializing():
            m = self.momentum
            correction = bessel_factor(count) if count is not None else 1.0
            ra_mean.value = m * ra_mean.value + (1 - m) * batch_mean
            ra_var.value = m * ra_var.value + (1 - m) * (batch_var * correction)
        return scale, bias, ra_mean.value, ra_var.value


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
    """ResNet50/101 bottleneck (torchvision v1.5: stride on the 3x3 conv).

    With `fused` set ('pallas'|'xla'|'interpret'), the training path runs the
    1x1 convs through ops.fused_conv_bn: batch-norm statistics are computed
    in the convolution's own output pass and the normalize+relu of each conv
    is applied on the fly in the NEXT conv's input pass, eliminating the
    dedicated BN statistic/normalize HBM passes XLA otherwise emits (the
    round-2 bandwidth lever, BASELINE.md roofline). Parameter and
    batch_stats trees are identical to the unfused path.
    """

    features: int  # bottleneck width; output channels = 4 * features
    stride: int = 1
    dtype: Any = jnp.float32
    fused: str | None = None

    @nn.compact
    def __call__(self, x: jax.Array, train: bool) -> jax.Array:
        if self.fused is not None:
            return self._call_fused(x, train)
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

    def _call_fused(self, x: jax.Array, train: bool) -> jax.Array:
        from multi_modal_regression_tpu.ops.fused_conv_bn import (
            conv1x1_bn_stats,
            fold_bn,
            stats_to_moments,
        )

        f = self.features
        cin = x.shape[-1]
        w1 = _ConvKernel((1, 1, cin, f), name="conv1")()
        w2 = _ConvKernel((3, 3, f, f), name="conv2")()
        w3 = _ConvKernel((1, 1, f, 4 * f), name="conv3")()
        bn1 = _BNState(f, name="bn1")
        bn2 = _BNState(f, name="bn2")
        bn3 = _BNState(4 * f, name="bn3")
        needs_ds = self.stride != 1 or cin != 4 * f
        wd = bnd = None
        if needs_ds:
            wd = _ConvKernel((1, 1, cin, 4 * f), name="downsample_conv")()
            bnd = _BNState(4 * f, name="downsample_bn")
        dt = self.dtype

        def conv2_xla(z1):
            return jax.lax.conv_general_dilated(
                z1.astype(dt), w2.astype(dt),
                window_strides=(self.stride, self.stride),
                padding=((1, 1), (1, 1)),
                dimension_numbers=("NHWC", "HWIO", "NHWC"),
            )

        if not train:
            # eval: plain convs + running-stat affine (same math as unfused,
            # bf16 like flax BatchNorm with dtype=bf16)
            def affine(y, bn):
                sc, bi, m, v = bn(None, None)
                a, b = fold_bn(m, v, sc, bi)
                return y * a.astype(y.dtype) + b.astype(y.dtype)

            y1 = jax.lax.conv_general_dilated(
                x.astype(dt), w1[...].astype(dt), (1, 1), ((0, 0), (0, 0)),
                dimension_numbers=("NHWC", "HWIO", "NHWC"),
            )
            z1 = nn.relu(affine(y1, bn1)).astype(dt)
            y2 = conv2_xla(z1)
            z2 = nn.relu(affine(y2, bn2)).astype(dt)
            y3 = jax.lax.conv_general_dilated(
                z2, w3[...].astype(dt), (1, 1), ((0, 0), (0, 0)),
                dimension_numbers=("NHWC", "HWIO", "NHWC"),
            )
            z3 = affine(y3, bn3)
            if needs_ds:
                yd = jax.lax.conv_general_dilated(
                    x.astype(dt), wd[...].astype(dt),
                    (self.stride, self.stride), ((0, 0), (0, 0)),
                    dimension_numbers=("NHWC", "HWIO", "NHWC"),
                )
                shortcut = affine(yd, bnd)
            else:
                shortcut = x
            return nn.relu(z3 + shortcut).astype(dt)

        from multi_modal_regression_tpu.ops.fused_conv_bn import (
            conv3x3_bn_stats,
        )

        impl = self.fused
        # conv1 (input is already post-activation -> no prologue)
        y1, s1 = conv1x1_bn_stats(x, w1, None, relu=False, impl=impl)
        count1 = y1.shape[0] * y1.shape[1] * y1.shape[2]
        m1, v1 = stats_to_moments(s1, count1)
        sc1, bi1, _, _ = bn1(m1, v1, count1)
        a1, b1 = fold_bn(m1, v1, sc1, bi1)
        if self.stride == 1:
            # fused 3x3: bn1+relu applied in the input pass, stats in the
            # output pass (falls back internally if VMEM would not fit)
            y2, s2 = conv3x3_bn_stats(
                y1, w2, (a1, b1), relu=True, impl=impl
            )
        else:
            # strided 3x3 stays XLA: materialize the normalized input,
            # stats via an XLA reduce (bf16 affine: f32 glue would force
            # f32 autodiff residuals, doubling the HBM traffic)
            z1 = nn.relu(y1 * a1.astype(dt) + b1.astype(dt))
            y2 = conv2_xla(z1)
            y2f = y2.astype(jnp.float32)
            s2 = jnp.stack([
                jnp.sum(y2f, axis=(0, 1, 2)),
                jnp.sum(y2f * y2f, axis=(0, 1, 2)),
            ])
        # BN element count from the ACTUAL output shape: dividing the input
        # count by stride**2 undercounts when the input spatial dims are odd
        # (e.g. 25x25 stride 2 -> 13x13 = 169, not 625//4 = 156), skewing
        # mean/var at those stages; conv3/downsample share conv2's dims
        count2 = y2.shape[0] * y2.shape[1] * y2.shape[2]
        m2, v2 = stats_to_moments(s2, count2)
        sc2, bi2, _, _ = bn2(m2, v2, count2)
        ab2 = fold_bn(m2, v2, sc2, bi2)
        # conv3: bn2+relu applied on the fly in the input pass
        y3, s3 = conv1x1_bn_stats(y2, w3, ab2, relu=True, impl=impl)
        m3, v3 = stats_to_moments(s3, count2)
        sc3, bi3, _, _ = bn3(m3, v3, count2)
        a3, b3 = fold_bn(m3, v3, sc3, bi3)
        if needs_ds:
            yd, sd = conv1x1_bn_stats(
                x, wd, None, stride=self.stride, relu=False, impl=impl
            )
            md, vd = stats_to_moments(sd, count2)
            scd, bid, _, _ = bnd(md, vd, count2)
            ad, bd = fold_bn(md, vd, scd, bid)
            shortcut = yd * ad.astype(dt) + bd.astype(dt)
        else:
            shortcut = x
        # all-bf16 glue: keeps autodiff residuals bf16 and lets XLA fuse
        # the affine+add+relu into one pass (flax's dtype-bf16 semantics)
        out = nn.relu(y3 * a3.astype(dt) + b3.astype(dt) + shortcut)
        return out.astype(dt)


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
    fused: str | None = None  # fused conv+BN impl for bottleneck blocks
    stem_pool: str | None = None  # fused stem bn+relu+maxpool (ops.stem_pool)

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
        if self.fused is not None or self.stem_pool is not None:
            # explicit folded BN (stats via one reduce, bf16 affine): the
            # flax module's normalize materializes f32 intermediates at
            # Pallas fusion boundaries, doubling stem HBM traffic
            from multi_modal_regression_tpu.ops.fused_conv_bn import (
                fold_bn,
                stats_to_moments,
            )

            bn1 = _BNState(64, name="bn1")
            if train:
                xf = x.astype(jnp.float32)
                s = jnp.stack([
                    jnp.sum(xf, axis=(0, 1, 2)),
                    jnp.sum(xf * xf, axis=(0, 1, 2)),
                ])
                count_stem = x.shape[0] * x.shape[1] * x.shape[2]
                m, v = stats_to_moments(s, count_stem)
                sc, bi, _, _ = bn1(m, v, count_stem)
            else:
                sc, bi, m, v = bn1(None, None)
            a, b = fold_bn(m, v, sc, bi)
            if self.stem_pool is not None:
                # one fused pass: affine + relu + maxpool (ops.stem_pool)
                from multi_modal_regression_tpu.ops.stem_pool import (
                    stem_bn_relu_pool,
                )

                x = stem_bn_relu_pool(x, a, b, self.stem_pool)
            else:
                x = nn.relu(x * a.astype(x.dtype) + b.astype(x.dtype))
                x = nn.max_pool(
                    x, (3, 3), strides=(2, 2), padding=((1, 1), (1, 1))
                )
        else:
            x = _bn(train, self.dtype, "bn1")(x)
            x = nn.relu(x)
            x = nn.max_pool(
                x, (3, 3), strides=(2, 2), padding=((1, 1), (1, 1))
            )

        # checkpoint_name tags are no-ops unless the train step wraps the
        # loss in jax.checkpoint with a save_only_these_names policy
        # (train/remat.py): then the residual stream is what gets saved and
        # everything between tags is recomputed in the backward pass
        from jax.ad_checkpoint import checkpoint_name

        x = checkpoint_name(x, "resnet_stem")
        for stage in range(self.num_stages):
            width = 64 * 2**stage
            for block in range(stage_sizes[stage]):
                stride = 2 if stage > 0 and block == 0 else 1
                kwargs = {"fused": self.fused} if bottleneck else {}
                x = block_cls(
                    features=width,
                    stride=stride,
                    dtype=self.dtype,
                    name=f"layer{stage + 1}_{block}",
                    **kwargs,
                )(x, train)
                x = checkpoint_name(x, "resnet_block")
            x = checkpoint_name(x, "resnet_stage")

        if not self.pool:
            return x
        # Global average pool (== AvgPool2d(full extent) for 224 inputs,
        # featureModels.py:35) -> (B, C). Accumulate the mean in at-least-
        # float32 (promote keeps f64 for the x64 parity harness).
        x = jnp.mean(
            x.astype(jnp.promote_types(jnp.float32, x.dtype)), axis=(1, 2)
        )
        return checkpoint_name(x, "resnet_features")


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
    fused: str | None = None

    @nn.compact
    def __call__(self, x: jax.Array, train: bool = False) -> jax.Array:
        stage_sizes, bottleneck = RESNET_CONFIGS[self.arch]
        block_cls = BottleneckBlock if bottleneck else BasicBlock
        width = 64 * 2 ** (self.stage - 1)
        x = x.astype(self.dtype)
        for block in range(stage_sizes[self.stage - 1]):
            stride = 2 if self.stage > 1 and block == 0 else 1
            kwargs = {"fused": self.fused} if bottleneck else {}
            x = block_cls(
                features=width, stride=stride, dtype=self.dtype,
                name=f"layer{self.stage}_{block}", **kwargs,
            )(x, train)
        if self.pool:
            x = jnp.mean(
                x.astype(jnp.promote_types(jnp.float32, x.dtype)), axis=(1, 2)
            )
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
        return x.astype(jnp.promote_types(jnp.float32, x.dtype))


def make_backbone(
    name: str,
    layer: str,
    dtype: Any = jnp.float32,
    fused: str | None = None,
    stem_pool: str | None = None,
) -> nn.Module:
    """Factory matching the reference's (model_type, layer_type) interface.

    name in RESNET_CONFIGS with layer 'layer2'|'layer3'|'layer4', or
    name in VGG_CONFIGS with layer 'fc6'|'fc7'. `fused` selects the fused
    conv+BN training path for bottleneck ResNets (see BottleneckBlock).
    """
    if name in RESNET_CONFIGS:
        return ResNetBackbone(
            arch=name, num_stages=int(layer[-1]), dtype=dtype, fused=fused,
            stem_pool=stem_pool,
        )
    if name in VGG_CONFIGS:
        return VGGBackbone(arch=name, layer=layer, dtype=dtype)
    raise ValueError(f"unknown backbone {name!r}")
