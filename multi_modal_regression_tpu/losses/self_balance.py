"""Self-balancing loss weight as carried on-device state.

The reference balances the classification and regression terms with a scalar
`s` recomputed on the host every step from the previous step's regression
loss (`s = log(Lr.item())`, learnGeodesicBDModel.py:180-185) — a device->host
sync in the hot loop. Here `s` is a device scalar carried in the train state:
the combined loss uses the *previous* step's `s` (identical one-step-lagged
semantics) and the new `s` is returned for the next step, so the whole thing
stays inside one compiled step function.

Three flavors used by the reference:
  warm-up:  loss = Lc + 0.5*exp(-2 s)*Lr + s,   s' = 0.5*log(Lr)
  main:     loss = Lc + exp(-s)*Lr + s,         s' = log(Lr)
  sigma:    the _rene scripts' homoscedastic form tracked as sigma on the
            host (learnSimpleBDModel_rene.py:140,160-170):
              loss = 1/(2 sigma^2)*Lr + 3*log(sigma), sigma' = sqrt(Lr/3)
            carried here as s = log(sigma) (sigma=1 start == s=0):
              loss = Lc + 0.5*exp(-2 s)*Lr + 3 s,  s' = 0.5*log(Lr/3)
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def init_log_balance() -> jax.Array:
    """Initial s = 0 (reference starts both phases at s = 0)."""
    return jnp.zeros((), dtype=jnp.float32)


def self_balanced(
    lc: jax.Array,
    lr: jax.Array,
    s: jax.Array,
    mode: str = "main",
) -> tuple[jax.Array, jax.Array]:
    """Combine (Lc, Lr) with the lagged balance scalar; return (loss, s_next).

    `s` enters the loss as a constant (the reference computes the weight from
    a host float, so no gradient flows through it) and `s_next` is computed
    from the *detached* Lr value.
    """
    s = jax.lax.stop_gradient(s)
    lr_detached = jax.lax.stop_gradient(lr)
    if mode == "warmup":
        loss = lc + 0.5 * jnp.exp(-2.0 * s) * lr + s
        s_next = 0.5 * jnp.log(jnp.maximum(lr_detached, 1e-30))
    elif mode == "main":
        loss = lc + jnp.exp(-s) * lr + s
        s_next = jnp.log(jnp.maximum(lr_detached, 1e-30))
    elif mode == "sigma":
        loss = lc + 0.5 * jnp.exp(-2.0 * s) * lr + 3.0 * s
        s_next = 0.5 * jnp.log(jnp.maximum(lr_detached / 3.0, 1e-30))
    else:
        raise ValueError(f"unknown mode: {mode!r}")
    return loss, s_next
