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
    (learnObjectnetBDModel.py:87, learnObjectnetModel.py:134; stepped at
    :190/:238).

    torch semantics: LambdaLR construction applies lambda(0)=1, so the
    warm-up pass (training_init, before the epoch loop) runs at init_lr;
    scheduler.step() then precedes training() inside the loop, so MAIN
    epoch e (0-based) runs at init_lr * lambda(e + 1) — 1/2, 1/3, ...,
    1/10, then a 10x drop each decade."""
    ep = epoch
    return (10.0 ** -(ep // 10)) / (1.0 + ep % 10)


def step_epoch_lr_factor(epoch: int) -> float:
    """StepLR(step_size=1, gamma=0.1): after k scheduler.step() calls the
    rate is init_lr * 0.1^k. Eleven reference scripts construct this AND
    actively step it before each training() epoch — the regression family
    (learnGeodesicRegressionModel.py:114,234 and the quaternion/independent/
    Elhoseiny variants), the classifiers (learnClassificationModel.py:94,167
    and _new), learnIndependentBDModel.py:115,255,
    learnRenderedBDModel.py:115,234, and learnProbabilisticBDModel.py:97,204.
    Warm-up (before the loop) runs at 0.1^0 = 1; main epoch e at 0.1^(e+1)."""
    return 0.1 ** epoch


def inv_epoch_lr_factor(epoch: int) -> float:
    """The joint/categorization family's LambdaLR `my_schedule(ep) =
    1/(1+ep)` (learnJointCatPoseModel2_top1.py:142-148 and the six other
    joint variants, learnCatGivenPoseModel.py:127,204,
    learnCategorizationModel.py:69,118). Same call pattern: main epoch e
    runs at init_lr / (e + 2); any pre-loop pass at lambda(0) = 1."""
    return 1.0 / (1.0 + epoch)


EPOCH_LR_FACTORS = {
    "objectnet": objectnet_epoch_lr_factor,
    "step": step_epoch_lr_factor,
    "inv": inv_epoch_lr_factor,
}


def epoch_lr_factor(kind: str, epoch: int) -> float:
    """Dispatch on cfg.epoch_lr_decay. `epoch` follows torch's post-step
    count: Trainer.fit passes (main_epoch + 1) because every stepping
    script calls scheduler.step() BEFORE training() inside its loop."""
    return EPOCH_LR_FACTORS[kind](epoch)


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
