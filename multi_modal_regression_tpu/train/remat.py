"""Rematerialization policies for the compiled train step.

The geodesic_bd train step is HBM-bandwidth-bound with the MXU ~60% idle
(BASELINE.md round-2 roofline): the bandwidth floor's premise is that every
residual block must materialize its activations in the forward pass and
re-read them in the backward pass. `jax.checkpoint` policies break exactly
that premise — saving only a chosen subset of activations and recomputing
the rest during the backward pass trades the idle MXU FLOPs for the
activation HBM traffic.

Mechanism: `models/backbones.py` tags the residual stream with
`jax.ad_checkpoint.checkpoint_name` ("resnet_stem" / "resnet_block" /
"resnet_stage" / "resnet_features"); the train step (steps.py) wraps its
loss function in `jax.checkpoint(loss_fn, policy=remat_policy(mode))`.
Tags are no-ops when no policy wraps them, and the parameter tree is
untouched (no flax lifted transforms), so checkpoints stay interchangeable
across modes.

Modes (`ExperimentConfig.remat`):

  none / None   no rematerialization (save whatever XLA decides)
  block         save only the per-block residual-stream activations (+stem
                and pooled features); each block's interior (bn/relu/conv
                intermediates) is recomputed from the block input
  stage         save only per-stage outputs; whole stages recompute in the
                backward (deepest recompute, fewest saved activations)
  conv          save convolution and matmul OUTPUTS only (primitive-based:
                conv_general_dilated / dot_general); all elementwise glue
                (BN normalize, relu, residual adds) is recomputed — the
                cheapest-recompute variant, targeting the materialized
                normalized-activation copies specifically
  dots          jax.checkpoint_policies.dots_saveable (matmuls only: conv
                outputs are NOT saved and get recomputed)
  nothing       save nothing checkpointable (maximum recompute)

The reference has no notion of rematerialization (PyTorch 0.4 saves every
intermediate; learnGeodesicBDModel.py:181-184); this is TPU-native perf
surface. Measured per-mode on the chip by benchmarks/bench_remat.py —
results recorded in BASELINE.md round 3.
"""

from __future__ import annotations

from typing import Any, Callable

import jax

REMAT_MODES = ("none", "block", "stage", "conv", "dots", "nothing")


def _convs_and_dots_saveable(prim, *_, **__) -> bool:
    return prim.name in ("conv_general_dilated", "dot_general")


def remat_policy(mode: str | None) -> Callable[..., Any] | None:
    """Map a config `remat` mode to a jax.checkpoint policy (None = off)."""
    if mode is None or mode == "none":
        return None
    cp = jax.checkpoint_policies
    if mode == "block":
        return cp.save_only_these_names(
            "resnet_stem", "resnet_block", "resnet_features"
        )
    if mode == "stage":
        return cp.save_only_these_names(
            "resnet_stem", "resnet_stage", "resnet_features"
        )
    if mode == "conv":
        return _convs_and_dots_saveable
    if mode == "dots":
        return cp.dots_saveable
    if mode == "nothing":
        return cp.nothing_saveable
    raise ValueError(f"remat must be one of {REMAT_MODES}, got {mode!r}")
