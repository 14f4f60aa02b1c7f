"""Learning-rate schedules.

`cyclical_triangular` is the optax port of the reference's mySGD cyclical
rate (helperFunctions.py:62-120): a triangle wave between alpha1 (cycle
endpoints) and alpha2 (cycle midpoint) with period c steps, used by the
snapshot-ensemble evaluation protocol — a results snapshot is dumped at
each LR minimum (evaluateGeodesicBDModel.py:141-145).
"""

from __future__ import annotations

import jax.numpy as jnp
import optax


def cyclical_triangular(
    c: int, alpha1: float = 1e-6, alpha2: float = 1e-8
) -> optax.Schedule:
    """lr(step): t = ((step mod c) + 1)/c; linear alpha1 -> alpha2 on the
    first half-cycle, alpha2 -> alpha1 on the second
    (helperFunctions.py:112-118; their state['step'] is 1-based so t uses
    (step-1) mod c + 1 — optax counts from 0, giving the same sequence)."""

    def schedule(step):
        t = (jnp.mod(step, c) + 1.0) / c
        rising = 2.0 * (1.0 - t) * alpha2 + (2.0 * t - 1.0) * alpha1
        falling = (1.0 - 2.0 * t) * alpha1 + 2.0 * t * alpha2
        return jnp.where(t <= 0.5, falling, rising)

    return schedule


def is_snapshot_step(step: int, c: int) -> bool:
    """True at the LR minimum of each cycle — the reference snapshots when
    `count % c == c/2` with 1-based count (evaluateGeodesicBDModel.py:141)."""
    return (step + 1) % c == c // 2


def objectnet_epoch_lr_factor(epoch: int) -> float:
    """The ObjectNet per-epoch LambdaLR factor: 10^-(ep//10) / (1 + ep%10)
    (learnObjectnetBDModel.py:87, learnObjectnetModel.py:134 — the two
    scripts that actually call scheduler.step(), at :190/:238).

    torch semantics: LambdaLR construction applies lambda(0)=1, so the
    warm-up pass (training_init, before the epoch loop) runs at init_lr;
    scheduler.step() then precedes training() inside the loop, so MAIN
    epoch e (0-based) runs at init_lr * lambda(e + 1) — 1/2, 1/3, ...,
    1/10, then a 10x drop each decade."""
    ep = epoch
    return (10.0 ** -(ep // 10)) / (1.0 + ep % 10)


def cyclical_sgd(
    c: int, alpha1: float = 1e-6, alpha2: float = 1e-8, momentum: float = 0.0
) -> optax.GradientTransformation:
    """SGD with the cyclical triangular rate (the mySGD optimizer)."""
    if momentum:
        return optax.chain(
            optax.trace(decay=momentum),
            optax.scale_by_schedule(cyclical_triangular(c, alpha1, alpha2)),
            optax.scale(-1.0),
        )
    return optax.chain(
        optax.scale_by_schedule(cyclical_triangular(c, alpha1, alpha2)),
        optax.scale(-1.0),
    )
