"""Model zoo: flax backbones + vectorized bin-delta / regression heads."""

from multi_modal_regression_tpu.models.backbones import (
    ResNetBackbone,
    VGGBackbone,
    make_backbone,
    RESNET_CONFIGS,
    VGG_CONFIGS,
)
from multi_modal_regression_tpu.models.heads import (
    MultiHeadMLP,
    SharedMLP,
    apply_output_nonlinearity,
    select_class,
)
from multi_modal_regression_tpu.models.bin_delta import (
    OneBinDeltaModel,
    OneDeltaPerBinModel,
    ProbabilisticOneDeltaPerBinModel,
)
from multi_modal_regression_tpu.models.joint import (
    JointCatPoseBDModel,
    JointCatPoseBDModel2,
    JointCatPoseRegModel,
    ElhoseinyBDModel,
    ElhoseinyRegressionModel,
    class_weights,
    mix_heads,
)
from multi_modal_regression_tpu.models.surgery import (
    graft_classifier_into_bd,
    graft_oracle_into_joint,
)
from multi_modal_regression_tpu.models.pose import (
    PerClassRegressionModel,
    PerClassClassificationModel,
    IndependentRegressionModel,
    IndependentBDModel,
    CategorizationModel,
    LabelConcatBDModel,
    LabelConcatDeltaPerBinModel,
    LabelConcatRegressionModel,
    LabelConcatClassificationModel,
)

__all__ = [
    "ResNetBackbone",
    "VGGBackbone",
    "make_backbone",
    "RESNET_CONFIGS",
    "VGG_CONFIGS",
    "MultiHeadMLP",
    "SharedMLP",
    "apply_output_nonlinearity",
    "select_class",
    "JointCatPoseBDModel",
    "JointCatPoseBDModel2",
    "JointCatPoseRegModel",
    "ElhoseinyBDModel",
    "ElhoseinyRegressionModel",
    "class_weights",
    "mix_heads",
    "graft_classifier_into_bd",
    "graft_oracle_into_joint",
    "OneBinDeltaModel",
    "OneDeltaPerBinModel",
    "ProbabilisticOneDeltaPerBinModel",
    "PerClassRegressionModel",
    "PerClassClassificationModel",
    "IndependentRegressionModel",
    "IndependentBDModel",
    "CategorizationModel",
    "LabelConcatBDModel",
    "LabelConcatDeltaPerBinModel",
    "LabelConcatRegressionModel",
    "LabelConcatClassificationModel",
]
