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
