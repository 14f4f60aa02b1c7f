"""SO(3) / quaternion geometry core (JAX, batched, jit/vmap-safe)."""

from multi_modal_regression_tpu.geometry.so3 import (
    rotation_from_euler,
    exp_so3,
    log_so3,
    hat,
    geodesic_angle,
    geodesic_distance_aa,
)
from multi_modal_regression_tpu.geometry.quaternion import (
    quat_from_rotation,
    quat_from_axis_angle,
    axis_angle_from_quat,
    quat_geodesic_angle,
    convert_dictionary,
)

__all__ = [
    "rotation_from_euler",
    "exp_so3",
    "log_so3",
    "hat",
    "geodesic_angle",
    "geodesic_distance_aa",
    "quat_from_rotation",
    "quat_from_axis_angle",
    "axis_angle_from_quat",
    "quat_geodesic_angle",
    "convert_dictionary",
]
