"""Pallas TPU kernels for the non-conv hot ops, with XLA fallbacks.

The CNN compute path (convs, BN, heads) compiles through XLA, which the
roofline analysis shows is already bandwidth-bound near its floor
(BASELINE.md). The kernels here cover the remaining on-device hot paths:

  preprocess   fused uint8 -> normalized bf16/f32 image batches (one HBM
               read of the uint8 bytes, one write — replaces the
               convert/scale/sub/div elementwise chain)
  assign       tiled pairwise-distance + argmin pose-bin assignment
               (dictionary lookup for large pose sets)
  augment      on-device bilinear resize (PIL-parity weights as two MXU
               einsums) + horizontal flips with their pose counterparts

Every kernel has a pure-XLA fallback (`use_pallas=False` or automatic on
non-TPU backends) that is also the numerical reference in tests.
"""

from multi_modal_regression_tpu.ops.preprocess import normalize_images_pallas
from multi_modal_regression_tpu.ops.assign import assign_bins_pallas
from multi_modal_regression_tpu.ops.augment import (
    device_preprocess,
    flip_images,
    flip_pose_euler,
    resize_images,
)

__all__ = [
    "normalize_images_pallas",
    "assign_bins_pallas",
    "device_preprocess",
    "flip_images",
    "flip_pose_euler",
    "resize_images",
]
