"""Serving export: ahead-of-time compiled, serialized inference functions.

The reference has no serving story (inference is ad-hoc script loops).
For production deployment this module packages a trained model's inference
path — uint8 images in, decoded poses out, preprocessing and dictionary
decode fused in-graph — as a `jax.export` artifact: a serialized StableHLO
program with embedded weights that reloads and runs without the Python
model definition.

  exported = export_inference(trainer, state, batch_size=64)
  blob = exported.serialize()            # bytes -> ship to the server
  fn = load_inference(blob)              # on the serving side
  poses = fn(images_uint8, labels)
"""

from __future__ import annotations

from typing import Callable

import jax
import jax.numpy as jnp
import numpy as np
from jax import export as jax_export

from multi_modal_regression_tpu.train.state import TrainState
from multi_modal_regression_tpu.train.steps import make_eval_step
from multi_modal_regression_tpu.train.trainer import Trainer


def make_inference_fn(
    trainer: Trainer, state: TrainState, resize_to: int | None = None
) -> Callable:
    """(images uint8 (B,S,S,3), labels int32 (B,)) -> decoded poses (B, D).

    Weights are closed over (baked into the exported program); the full
    path (on-device resize when the inputs are raw-size, normalize,
    backbone with running BN stats, head bank, bin argmax + dictionary
    decode) is one jittable function. Only params + batch_stats are held —
    not the optimizer moments.
    """
    import types

    eval_step = make_eval_step(trainer.apply_fn, trainer.problem, resize_to)
    frozen = types.SimpleNamespace(
        params=jax.device_get(state.params),
        batch_stats=jax.device_get(state.batch_stats),
    )

    def infer(images: jax.Array, labels: jax.Array) -> jax.Array:
        batch = {
            "xdata": images,
            "label": labels,
            # euler is unused for prediction; a zero batch satisfies the
            # eval-step signature (targets are only needed for metrics)
            "euler": jnp.zeros((images.shape[0], 3), jnp.float32),
        }
        ypred, _ = eval_step(frozen, batch)
        return ypred

    return infer


def export_inference(
    trainer: Trainer,
    state: TrainState,
    batch_size: int | str = 64,
    image_size: int | None = None,
) -> jax_export.Exported:
    """AOT-export the inference function.

    batch_size: an int exports a fixed batch shape; the string "dynamic"
    exports with a SYMBOLIC batch dimension (jax.export shape polymorphism)
    — one artifact serves every batch size, specializing at call time.

    With image_size different from the model's training resolution, the
    on-device bilinear resize is fused into the exported graph, so raw-size
    inputs serve directly.
    """
    size = image_size or trainer.config.image_size
    resize_to = (
        trainer.config.image_size if size != trainer.config.image_size else None
    )
    infer = make_inference_fn(trainer, state, resize_to=resize_to)
    if batch_size == "dynamic":
        (b,) = jax_export.symbolic_shape("b")
    else:
        b = int(batch_size)
    return jax_export.export(jax.jit(infer))(
        jax.ShapeDtypeStruct((b, size, size, 3), jnp.uint8),
        jax.ShapeDtypeStruct((b,), jnp.int32),
    )


def save_inference(path, exported: jax_export.Exported) -> None:
    with open(path, "wb") as f:
        f.write(exported.serialize())


def load_inference(path_or_bytes) -> Callable:
    """Deserialize an exported artifact into a callable (no model code)."""
    if isinstance(path_or_bytes, (bytes, bytearray)):
        blob = bytes(path_or_bytes)
    else:
        with open(path_or_bytes, "rb") as f:
            blob = f.read()
    exported = jax_export.deserialize(blob)

    def fn(images: np.ndarray, labels: np.ndarray):
        return exported.call(
            jnp.asarray(images, jnp.uint8), jnp.asarray(labels, jnp.int32)
        )

    return fn
