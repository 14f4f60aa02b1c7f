"""Train state carried across compiled steps.

Everything the reference keeps in Python globals during training — the step
counter, the model + BN running stats, the optimizer state, and the
self-balancing loss scalar `s` (learnGeodesicBDModel.py:100-102,185) — lives
here as one donated pytree, so a training step is a single compiled program
with no host round-trips. Checkpointing this state (orbax) also fixes the
reference's save-only story (params only, no optimizer/step/s —
learnGeodesicBDModel.py:231-232).
"""

from __future__ import annotations

from typing import Any

import jax
import jax.numpy as jnp
import optax
from flax import struct


class TrainState(struct.PyTreeNode):
    step: jax.Array
    params: Any
    batch_stats: Any
    opt_state: Any
    s: jax.Array  # self-balancing log-scale (losses.self_balance)
    rng: jax.Array  # PRNG key for in-step augmentation (random flips)


def create_train_state(
    variables: dict, tx: optax.GradientTransformation, seed: int = 0
) -> TrainState:
    """Build the initial state from `model.init(...)` variables."""
    params = variables["params"]
    return TrainState(
        step=jnp.zeros((), jnp.int32),
        params=params,
        batch_stats=variables.get("batch_stats", {}),
        opt_state=tx.init(params),
        s=jnp.zeros((), jnp.float32),
        rng=jax.random.PRNGKey(seed),
    )
