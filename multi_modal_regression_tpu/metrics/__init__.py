"""Host-side evaluation metrics (numpy, float64)."""

from multi_modal_regression_tpu.metrics.pose_error import (
    geodesic_error_deg,
    quaternion_error_deg,
    pose_error_stats,
    mean_class_median_error,
    mean_class_accuracy,
    per_class_report,
)
from multi_modal_regression_tpu.metrics.detection import (
    voc_ap,
    box_overlap,
    compute_detection_metrics,
)

__all__ = [
    "geodesic_error_deg",
    "quaternion_error_deg",
    "pose_error_stats",
    "mean_class_median_error",
    "mean_class_accuracy",
    "per_class_report",
    "voc_ap",
    "box_overlap",
    "compute_detection_metrics",
]
