"""Parameter-tree surgery for two-stage pipelines.

The reference chains checkpoints: a trained pose "oracle" (OneBinDelta /
OneDeltaPerBin / Regression) is wrapped into a JointCatPoseModel whose
constructor re-uses the oracle's modules and adds a fresh category fc
(learnJointCatPoseModel_top1.py:93-106, learnJointCatPoseModel2_weighted.py:
93-107), then `<S>.tar -> <S>_cat.tar -> <S>_wgt.tar` are trained in stages.
Here checkpoints are flax variable dicts, so chaining is pure tree surgery:
copy the oracle's named subtrees into the joint model's tree and keep the
new branches at their fresh init.
"""

from __future__ import annotations

from typing import Any, Mapping


def _merged(dst: Mapping, src: Mapping, mapping: Mapping[str, str]) -> dict:
    """Copy src[k_src] over dst[k_dst] for each (k_dst, k_src) in mapping."""
    out = dict(dst)
    for k_dst, k_src in mapping.items():
        if k_src in src:
            out[k_dst] = src[k_src]
    return out


def _split_backbone(tree: Mapping, stage: int = 4) -> tuple[dict, dict]:
    """Split a flat ResNet backbone tree into (trunk, stage-N) subtrees."""
    trunk, last = {}, {}
    prefix = f"layer{stage}_"
    for k, v in tree.items():
        (last if k.startswith(prefix) else trunk)[k] = v
    return trunk, last


def graft_classifier_into_bd(
    bd_variables: Mapping[str, Any],
    classifier_variables: Mapping[str, Any],
) -> dict:
    """Warm-start a OneBinDeltaModel from a trained pose-classification
    model: copy its backbone and its per-class bin heads (the classifier's
    `pose_models` bank IS a bin_3layer bank) into `feature_model` /
    `bin_models`, leaving the fresh delta heads untouched — the
    learnSimpleBDModel_rene.py:89-130 protocol."""
    out = {}
    for coll in bd_variables:
        src = classifier_variables.get(coll, {})
        out[coll] = _merged(
            bd_variables[coll], src,
            {"feature_model": "feature_model", "bin_models": "pose_models"},
        )
    return out


def graft_oracle_into_joint(
    joint_variables: Mapping[str, Any],
    oracle_variables: Mapping[str, Any],
    model_kind: str,
) -> dict:
    """Copy an oracle checkpoint's modules into a joint model's variables.

    model_kind: 'joint_bd_v1' (bin_models/res_models), 'joint_bd_v2'
    (backbone split into trunk + pose layer4; the category layer4 branch is
    ALSO seeded from the oracle's layer4 — the reference seeds it from
    torchvision-pretrained layer4, learnJointCatPoseModel2_weighted.py:90,105),
    or 'joint_reg_v3' (pose_models). The new 'fc' head keeps its fresh init.
    """
    if model_kind in ("joint_bd_v1", "elhoseiny_like"):
        mapping = {
            "feature_model": "feature_model",
            "bin_models": "bin_models",
            "res_models": "res_models",
        }
    elif model_kind == "joint_reg_v3":
        mapping = {
            "feature_model": "feature_model",
            "pose_models": "pose_models",
        }
    elif model_kind == "joint_bd_v2":
        out = {}
        for coll in joint_variables:
            j = dict(joint_variables[coll])
            o = oracle_variables.get(coll, {})
            if "feature_model" in o:
                trunk, layer4 = _split_backbone(o["feature_model"])
                j["feature_trunk"] = trunk
                j["pose_stage"] = layer4
                j["category_stage"] = layer4
            for k in ("bin_models", "res_models"):
                if k in o:
                    j[k] = o[k]
            out[coll] = j
        return out
    else:
        raise ValueError(f"unknown model_kind {model_kind!r}")

    return {
        coll: _merged(
            joint_variables[coll], oracle_variables.get(coll, {}), mapping
        )
        for coll in joint_variables
    }
