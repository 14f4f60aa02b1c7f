"""Pallas TPU kernels for the non-conv hot ops, with XLA fallbacks.

The CNN compute path (convs, BN, heads) compiles through XLA, which the
roofline analysis shows is already bandwidth-bound near its floor
(BASELINE.md). The kernels here cover the remaining on-device hot paths:

  preprocess   fused uint8 -> normalized bf16/f32 image batches (one HBM
               read of the uint8 bytes, one write — replaces the
               convert/scale/sub/div elementwise chain)
  assign       tiled pairwise-distance + argmin pose-bin assignment
               (dictionary lookup for large pose sets)

Every kernel has a pure-XLA fallback (`use_pallas=False` or automatic on
non-TPU backends) that is also the numerical reference in tests.
"""

from multi_modal_regression_tpu.ops.preprocess import normalize_images_pallas
from multi_modal_regression_tpu.ops.assign import assign_bins_pallas

__all__ = ["normalize_images_pallas", "assign_bins_pallas"]
