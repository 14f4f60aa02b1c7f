"""Torchvision checkpoint -> flax backbone parameter conversion.

The reference constructs its backbones from torchvision's pretrained model
zoo (featureModels.py:17,50). This environment has no torchvision and no
network egress, so pretrained weights arrive as a user-supplied state_dict
file (.pth, loadable with CPU torch); this module maps it onto our
ResNetBackbone / VGGBackbone parameter trees:

  torch conv weight (O, I, kH, kW)  ->  flax kernel (kH, kW, I, O)
  torch linear weight (O, I)        ->  flax kernel (I, O)
  BatchNorm weight/bias/running_*   ->  scale/bias + batch_stats mean/var
  resnet `layerL.B.convN`           ->  `layerL_B/convN` (see backbones.py)

Without a checkpoint the backbones train from random init (quality parity
with the reference depends on pretrained weights; throughput does not).
"""

from __future__ import annotations

from typing import Any, Mapping

import numpy as np

from multi_modal_regression_tpu.models.backbones import RESNET_CONFIGS, VGG_CONFIGS


def _conv_kernel(w: np.ndarray) -> np.ndarray:
    return np.transpose(np.asarray(w), (2, 3, 1, 0))  # OIHW -> HWIO


def _load_state_dict(path_or_dict: Any) -> dict[str, np.ndarray]:
    if isinstance(path_or_dict, Mapping):
        sd = path_or_dict
    else:
        import torch

        sd = torch.load(path_or_dict, map_location="cpu", weights_only=True)
    return {k: np.asarray(v) for k, v in sd.items()}


def _bn(sd: dict, prefix: str) -> tuple[dict, dict]:
    params = {
        "scale": sd[f"{prefix}.weight"],
        "bias": sd[f"{prefix}.bias"],
    }
    stats = {
        "mean": sd[f"{prefix}.running_mean"],
        "var": sd[f"{prefix}.running_var"],
    }
    return params, stats


def load_torchvision_resnet(
    path_or_dict: Any, arch: str = "resnet50", num_stages: int = 4
) -> tuple[dict, dict]:
    """(params, batch_stats) trees for ResNetBackbone from a torchvision
    resnet state_dict."""
    sd = _load_state_dict(path_or_dict)
    stage_sizes, bottleneck = RESNET_CONFIGS[arch]
    n_convs = 3 if bottleneck else 2
    params: dict = {"conv1": {"kernel": _conv_kernel(sd["conv1.weight"])}}
    stats: dict = {}
    params["bn1"], stats["bn1"] = _bn(sd, "bn1")

    for stage in range(num_stages):
        for block in range(stage_sizes[stage]):
            t = f"layer{stage + 1}.{block}"
            f = f"layer{stage + 1}_{block}"
            bp: dict = {}
            bs: dict = {}
            for ci in range(1, n_convs + 1):
                bp[f"conv{ci}"] = {
                    "kernel": _conv_kernel(sd[f"{t}.conv{ci}.weight"])
                }
                bp[f"bn{ci}"], bs[f"bn{ci}"] = _bn(sd, f"{t}.bn{ci}")
            if f"{t}.downsample.0.weight" in sd:
                bp["downsample_conv"] = {
                    "kernel": _conv_kernel(sd[f"{t}.downsample.0.weight"])
                }
                bp["downsample_bn"], bs["downsample_bn"] = _bn(
                    sd, f"{t}.downsample.1"
                )
            params[f] = bp
            stats[f] = bs
    return params, stats


def load_torchvision_vgg(
    path_or_dict: Any, arch: str = "vgg13", layer: str = "fc6"
) -> tuple[dict, dict]:
    """(params, batch_stats) trees for VGGBackbone from a torchvision
    vggNN_bn state_dict."""
    sd = _load_state_dict(path_or_dict)
    cfg = VGG_CONFIGS[arch]
    params: dict = {}
    stats: dict = {}
    ti = 0  # torch features index
    conv_idx = 0
    for v in cfg:
        if v == "M":
            ti += 1
            continue
        params[f"conv{conv_idx}"] = {
            "kernel": _conv_kernel(sd[f"features.{ti}.weight"]),
            "bias": sd[f"features.{ti}.bias"],
        }
        params[f"bn{conv_idx}"], stats[f"bn{conv_idx}"] = _bn(
            sd, f"features.{ti + 1}"
        )
        ti += 3  # conv, bn, relu
        conv_idx += 1
    params["fc6"] = {
        "kernel": np.transpose(sd["classifier.0.weight"]),
        "bias": sd["classifier.0.bias"],
    }
    if layer == "fc7":
        params["fc7"] = {
            "kernel": np.transpose(sd["classifier.3.weight"]),
            "bias": sd["classifier.3.bias"],
        }
    return params, stats


def load_torchvision_backbone(
    path_or_dict: Any, name: str, layer: str = "layer4"
) -> tuple[dict, dict]:
    """Dispatch by backbone name (the make_backbone factory's names)."""
    if name in RESNET_CONFIGS:
        stages = int(layer[-1]) if layer.startswith("layer") else 4
        return load_torchvision_resnet(path_or_dict, name, stages)
    if name in VGG_CONFIGS:
        return load_torchvision_vgg(path_or_dict, name, layer)
    raise ValueError(f"unknown backbone {name!r}")


# ---------------------------------------------------------------------------
# full reference-checkpoint import (models/<save_str>.tar files)
# ---------------------------------------------------------------------------

# The reference's resnet feature model is nn.Sequential of the first 8
# torchvision children — conv1, bn1, relu, maxpool, layer1..layer4
# (featureModels.py:34); its state_dict keys are positional:
_RESNET_SEQ = {
    "0": "conv1", "1": "bn1",
    "4": "layer1", "5": "layer2", "6": "layer3", "7": "layer4",
}


def _unwrap_reference_features(sd: dict) -> dict:
    """Map `feature_model.features.N...` keys back onto torchvision names
    (`conv1.weight`, `layer3.0.conv2.weight`, ...) so the backbone loaders
    apply unchanged."""
    out = {}
    for k, v in sd.items():
        if not k.startswith("feature_model."):
            continue
        rest = k[len("feature_model."):]
        if rest.startswith("features."):
            idx, _, tail = rest[len("features."):].partition(".")
            if idx in _RESNET_SEQ:
                name = _RESNET_SEQ[idx]
                out[f"{name}.{tail}" if tail else name] = v
        else:
            # vgg wrapper keeps named submodules (features/classifier,
            # featureModels.py:55-59) — pass through as-is
            out[rest] = v
    return out


def _stack_head_bank(
    sd: dict, prefix: str, num_heads: int, n_layers: int
) -> tuple[dict, dict]:
    """Stack `prefix.{i}.fcL/bnL` per-head modules (binDeltaModels.py:16-91
    blocks held in nn.ModuleLists) into one MultiHeadMLP parameter bank:

      fcL.weight (O, I) x H  ->  fcL_kernel (H, I, O)
      bnL.weight/bias    x H  ->  bnL scale/bias (H, F) (+ running stats)
      final fc bias      x H  ->  fcN_bias (H, O)
    """
    params: dict = {}
    stats: dict = {}
    for li in range(1, n_layers + 1):
        w = np.stack(
            [
                np.transpose(sd[f"{prefix}.{i}.fc{li}.weight"])
                for i in range(num_heads)
            ]
        )
        params[f"fc{li}_kernel"] = w
        if li == n_layers:
            params[f"fc{li}_bias"] = np.stack(
                [sd[f"{prefix}.{i}.fc{li}.bias"] for i in range(num_heads)]
            )
        else:
            params[f"bn{li}"] = {
                "scale": np.stack(
                    [sd[f"{prefix}.{i}.bn{li}.weight"] for i in range(num_heads)]
                ),
                "bias": np.stack(
                    [sd[f"{prefix}.{i}.bn{li}.bias"] for i in range(num_heads)]
                ),
            }
            stats[f"bn{li}"] = {
                "mean": np.stack(
                    [
                        sd[f"{prefix}.{i}.bn{li}.running_mean"]
                        for i in range(num_heads)
                    ]
                ),
                "var": np.stack(
                    [
                        sd[f"{prefix}.{i}.bn{li}.running_var"]
                        for i in range(num_heads)
                    ]
                ),
            }
    return params, stats


def _shared_head(sd: dict, prefix: str, n_layers: int) -> tuple[dict, dict]:
    """Convert one `prefix.fcL/bnL` shared MLP head (the class-agnostic
    bin_3layer/res_3layer blocks of the ObjectNet label-concat models,
    objectnetHelperFunctions.py:110-152) into SharedMLP variables:
    fcL.weight (O, I) -> fcL/kernel (I, O); BN affine + running stats."""
    params: dict = {}
    stats: dict = {}
    for li in range(1, n_layers + 1):
        p = {"kernel": np.transpose(sd[f"{prefix}.fc{li}.weight"])}
        if li == n_layers:
            p["bias"] = np.asarray(sd[f"{prefix}.fc{li}.bias"])
        params[f"fc{li}"] = p
        if li < n_layers:
            params[f"bn{li}"] = {
                "scale": np.asarray(sd[f"{prefix}.bn{li}.weight"]),
                "bias": np.asarray(sd[f"{prefix}.bn{li}.bias"]),
            }
            stats[f"bn{li}"] = {
                "mean": np.asarray(sd[f"{prefix}.bn{li}.running_mean"]),
                "var": np.asarray(sd[f"{prefix}.bn{li}.running_var"]),
            }
    return params, stats


def _plain_linear(sd: dict, prefix: str) -> dict:
    """One bare nn.Linear (the joint scripts' category fc,
    learnJointCatPoseModel_top1.py:104) -> a single-layer SharedMLP."""
    return {
        "fc1": {
            "kernel": np.transpose(sd[f"{prefix}.weight"]),
            "bias": np.asarray(sd[f"{prefix}.bias"]),
        }
    }


def load_reference_bd_checkpoint(path_or_dict: Any, cfg) -> dict:
    """Convert a reference bin-and-delta checkpoint (the model.state_dict()
    `models/<save_str>.tar` files, learnGeodesicBDModel.py:231-232) into
    this framework's flax variables for the matching config.

    Supports the three binDeltaModels.py model families:
      OneBinDeltaModel                 (model_kind 'one_bin_delta')
      OneDeltaPerBinModel              ('one_delta_per_bin')
      ProbabilisticOneDeltaPerBinModel ('probabilistic')
    and the four ObjectNet label-concat families
    (objectnetHelperFunctions.py:155-231):
      OneBinDeltaModel    ('labelconcat_bd')
      OneDeltaPerBinModel ('labelconcat_delta_per_bin')
      RegressionModel     ('labelconcat_regression')
      ClassificationModel ('labelconcat_classification')
    the class-agnostic independent/rendered inline model
    (learnIndependentBDModel.py:88-108): shared bin head + per-cluster
    delta bank ('independent_bd'),
    and the grafted joint cat+pose wrappers (the scripts' inline
    JointCatPoseModel over a BD / regression oracle + category nn.Linear,
    learnJointCatPoseModel_top1.py:93-130, _3_top1.py:96-118):
      JointCatPoseModel over OneBinDeltaModel/OneDeltaPerBinModel
                          ('joint_bd_v1', multires via cfg.multires)
      JointCatPoseModel over RegressionModel ('joint_reg_v3')

    Returns `{"params": ..., "batch_stats": ...}` ready for
    TrainState / model.apply. A user migrating from the reference loads
    their trained torch checkpoint and keeps serving it from TPU.
    """
    sd = _load_state_dict(path_or_dict)
    fm = _unwrap_reference_features(sd)
    bb_params, bb_stats = load_torchvision_backbone(
        fm, cfg.feature_network, cfg.feature_layer
    )
    params: dict = {"feature_model": bb_params}
    stats: dict = {"feature_model": bb_stats}
    if cfg.model_kind == "categorization":
        # learnCategorizationModel.py:51-60: backbone + a bare nn.Linear
        # named `fc` -> CategorizationModel's `category_model`
        params["category_model"] = _plain_linear(sd, "fc")
        return {"params": params, "batch_stats": stats}
    if cfg.model_kind == "labelconcat_bd":
        for name in ("bin_model", "res_model"):
            params[name], stats[name] = _shared_head(sd, name, n_layers=3)
        return {"params": params, "batch_stats": stats}
    if cfg.model_kind == "labelconcat_delta_per_bin":
        params["bin_model"], stats["bin_model"] = _shared_head(
            sd, "bin_model", n_layers=3
        )
        # one res_2layer per cluster (objectnetHelperFunctions.py:181)
        params["res_models"], stats["res_models"] = _stack_head_bank(
            sd, "res_models", cfg.dict_size, n_layers=2
        )
        return {"params": params, "batch_stats": stats}
    if cfg.model_kind in (
        "labelconcat_regression", "labelconcat_classification",
        # class-agnostic IndependentModel: the same shared model_3layer
        # pose head (learnIndependentRegressionModel.py:74-85)
        "independent_regression",
    ):
        params["pose_model"], stats["pose_model"] = _shared_head(
            sd, "pose_model", n_layers=3
        )
        return {"params": params, "batch_stats": stats}
    if cfg.model_kind in ("per_class_regression", "per_class_classification"):
        # RegressionModel / ClassificationModel: one model_3layer or
        # bin_3layer per class, label-selected
        # (learnGeodesicRegressionModel.py:84-107,
        # learnClassificationModel.py:84-104)
        params["pose_models"], stats["pose_models"] = _stack_head_bank(
            sd, "pose_models", cfg.num_classes, n_layers=3
        )
        return {"params": params, "batch_stats": stats}
    if cfg.model_kind == "independent_bd":
        # the independent/rendered scripts' inline class-agnostic
        # OneDeltaPerBinModel: shared bin_3layer, one res_2layer per
        # CLUSTER, no category head (learnIndependentBDModel.py:88-108,
        # learnRenderedBDModel.py:84-104)
        params["bin_model"], stats["bin_model"] = _shared_head(
            sd, "bin_model", n_layers=3
        )
        params["res_models"], stats["res_models"] = _stack_head_bank(
            sd, "res_models", cfg.dict_size, n_layers=2
        )
        return {"params": params, "batch_stats": stats}
    if cfg.model_kind == "elhoseiny_bd":
        # the script's inline OneDeltaPerBinModel: shared bin_3layer, one
        # res_2layer per CLUSTER, category nn.Linear
        # (learnElhoseinyBDModel.py:87-110)
        params["bin_model"], stats["bin_model"] = _shared_head(
            sd, "bin_model", n_layers=3
        )
        params["res_models"], stats["res_models"] = _stack_head_bank(
            sd, "res_models", cfg.dict_size, n_layers=2
        )
        params["category_model"] = _plain_linear(sd, "category_model")
        return {"params": params, "batch_stats": stats}
    if cfg.model_kind == "elhoseiny_reg":
        # ElhoseinyModel: shared model_3layer pose head (pi*tanh applied in
        # forward) + category nn.Linear (learnElhoseinyRegressionModel.py:74-91)
        params["pose_model"], stats["pose_model"] = _shared_head(
            sd, "pose_model", n_layers=3
        )
        params["category_model"] = _plain_linear(sd, "category_model")
        return {"params": params, "batch_stats": stats}
    if cfg.model_kind == "joint_reg_v3":
        # JointCatPoseModel over a regression oracle: per-class pose bank +
        # category fc (learnJointCatPoseModel3_top1.py:96-118)
        params["pose_models"], stats["pose_models"] = _stack_head_bank(
            sd, "pose_models", cfg.num_classes, n_layers=3
        )
        params["fc"] = _plain_linear(sd, "fc")
        return {"params": params, "batch_stats": stats}
    params["bin_models"], stats["bin_models"] = _stack_head_bank(
        sd, "bin_models", cfg.num_classes, n_layers=3
    )
    multires = cfg.model_kind in ("one_delta_per_bin", "probabilistic") or (
        cfg.model_kind == "joint_bd_v1" and cfg.multires
    )
    if multires:
        # one res_2layer per (class, cluster), class-major — the reference's
        # view(num_classes, num_clusters, ...) order (binDeltaModels.py:141)
        res_heads, res_layers = cfg.num_classes * cfg.dict_size, 2
    elif cfg.model_kind in ("one_bin_delta", "joint_bd_v1"):
        res_heads, res_layers = cfg.num_classes, 3
    else:
        raise ValueError(
            f"model_kind {cfg.model_kind!r} is not a bin-delta family"
        )
    params["res_models"], stats["res_models"] = _stack_head_bank(
        sd, "res_models", res_heads, n_layers=res_layers
    )
    if cfg.model_kind == "joint_bd_v1":
        # the grafted category head (learnJointCatPoseModel_top1.py:93-104)
        params["fc"] = _plain_linear(sd, "fc")
    return {"params": params, "batch_stats": stats}
