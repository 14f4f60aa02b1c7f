"""Shared setup for the benchmark scripts: the flagship geodesic_bd
trainer, a jit-initialized state, and a synthetic uint8 batch on device.

Every bench follows the same measurement discipline (CLAUDE.md): jitted
init (un-jitted flax init dispatches thousands of tiny ops through the
TPU tunnel), donated chained state, and a D2H scalar fetch as the only
true sync (block_until_ready is a no-op through the tunnel).
"""

from __future__ import annotations

import numpy as np


def setup_flagship(
    batch_size: int = 96,
    image_size: int = 224,
    rng: np.random.Generator | None = None,
    **cfg_overrides,
):
    """(trainer, state, device_batch) for the bench.py config.

    cfg_overrides go to get_config('geodesic_bd', ...) on top of the
    standard bench settings (bf16 compute, items_per_batch=batch//12).
    """
    import jax
    import jax.numpy as jnp

    from multi_modal_regression_tpu.dictionary.kmeans import KMeansDictionary
    from multi_modal_regression_tpu.parallel.mesh import make_mesh
    from multi_modal_regression_tpu.train import Trainer, get_config
    from multi_modal_regression_tpu.train.state import create_train_state

    rng = rng or np.random.default_rng(0)
    opts = dict(
        image_size=image_size,
        items_per_batch=batch_size // 12,
        compute_dtype="bfloat16",
    )
    opts.update(cfg_overrides)
    cfg = get_config("geodesic_bd", **opts)
    centers = (0.8 * rng.standard_normal((cfg.dict_size, 3))).astype(np.float32)
    trainer = Trainer(
        cfg,
        dictionary=KMeansDictionary(cluster_centers=centers),
        mesh=make_mesh(jax.devices()[:1]),
    )
    model = trainer.model
    x0 = jnp.zeros((2, image_size, image_size, 3), jnp.float32)
    l0 = jnp.zeros((2,), jnp.int32)
    variables = jax.jit(lambda k: model.init(k, x0, l0, train=False))(
        jax.random.PRNGKey(cfg.seed)
    )
    state = create_train_state(variables, trainer.tx)
    batch = make_device_batch(trainer, batch_size, image_size, rng)
    return trainer, state, batch


def make_device_batch(trainer, batch_size: int, image_size: int, rng):
    """One synthetic uint8 batch sharded onto the trainer's mesh."""
    return trainer.shard_batch({
        "xdata": rng.integers(
            0, 256, (batch_size, image_size, image_size, 3), np.uint8
        ),
        "euler": rng.uniform(-90, 90, (batch_size, 3)).astype(np.float32),
        "label": np.tile(
            np.arange(12, dtype=np.int32), -(-batch_size // 12)
        )[:batch_size],
    })
