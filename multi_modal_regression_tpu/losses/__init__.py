"""The bin-delta loss zoo as pure JAX functions.

Re-design of the reference's binDeltaLosses.py nn.Module zoo: every loss is a
pure function of (predictions, targets, dictionary), jit/grad-safe, with no
host syncs. The adaptive loss-balance scalar `s` is carried train-state (see
self_balance) instead of a per-step host round-trip.
"""

from multi_modal_regression_tpu.losses.primitives import (
    cross_entropy,
    kl_div_mean,
    mse,
    l1,
    geodesic_aa,
    geodesic_quat,
    geodesic_rotmat,
)
from multi_modal_regression_tpu.losses.bin_delta import (
    simple_loss,
    bd_loss,
    relaxed_simple_loss,
    relaxed_bd_loss,
    probabilistic_loss,
    probabilistic_multires_loss,
    riemannian_loss,
    per_bin_residual_loss,
    decode_bin_delta,
    expected_regression,
)
from multi_modal_regression_tpu.losses.self_balance import (
    self_balanced,
    init_log_balance,
)

__all__ = [
    "cross_entropy",
    "kl_div_mean",
    "mse",
    "l1",
    "geodesic_aa",
    "geodesic_quat",
    "geodesic_rotmat",
    "simple_loss",
    "bd_loss",
    "relaxed_simple_loss",
    "relaxed_bd_loss",
    "probabilistic_loss",
    "probabilistic_multires_loss",
    "riemannian_loss",
    "per_bin_residual_loss",
    "decode_bin_delta",
    "expected_regression",
    "self_balanced",
    "init_log_balance",
]
