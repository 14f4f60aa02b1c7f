"""Inference (eval-step) throughput on the real chip.

Measures the full eval step — uint8 normalize, backbone, head banks, bin
argmax + dictionary decode — at several batch sizes (geodesic_bd flagship,
bf16). Distinct device-resident batches are cycled so the tunnel cannot
reuse identical dispatches, and the sync is the D2H fetch of the last
batch's predictions (block_until_ready is a no-op through the tunnel).

Usage: python benchmarks/bench_infer.py [batch ...]
"""

from __future__ import annotations

import json
import pathlib
import sys
import time

sys.path.insert(0, str(pathlib.Path(__file__).resolve().parent.parent))

import numpy as np

IMAGE_SIZE = 224
N_BATCHES = 8
REPEATS = 5  # total steps = N_BATCHES * REPEATS


def main() -> None:
    import jax
    import jax.numpy as jnp

    from multi_modal_regression_tpu.dictionary.kmeans import KMeansDictionary
    from multi_modal_regression_tpu.parallel.mesh import make_mesh
    from multi_modal_regression_tpu.train import Trainer, get_config
    from multi_modal_regression_tpu.train.state import create_train_state

    batches = [int(b) for b in sys.argv[1:]] or [96, 256]
    rng = np.random.default_rng(0)
    cfg = get_config(
        "geodesic_bd", image_size=IMAGE_SIZE, compute_dtype="bfloat16",
    )
    centers = (0.8 * rng.standard_normal((cfg.dict_size, 3))).astype(np.float32)
    trainer = Trainer(
        cfg,
        dictionary=KMeansDictionary(cluster_centers=centers),
        mesh=make_mesh(jax.devices()[:1]),
    )
    model = trainer.model
    x0 = jnp.zeros((2, IMAGE_SIZE, IMAGE_SIZE, 3), jnp.float32)
    l0 = jnp.zeros((2,), jnp.int32)
    variables = jax.jit(lambda k: model.init(k, x0, l0, train=False))(
        jax.random.PRNGKey(cfg.seed)
    )
    state = create_train_state(variables, trainer.tx)
    eval_step = trainer._eval_step

    for B in batches:
        dev_batches = []
        for _ in range(N_BATCHES):
            dev_batches.append(trainer.shard_batch({
                "xdata": rng.integers(
                    0, 256, (B, IMAGE_SIZE, IMAGE_SIZE, 3), np.uint8
                ),
                "euler": rng.uniform(-90, 90, (B, 3)).astype(np.float32),
                "label": np.tile(
                    np.arange(12, dtype=np.int32), -(-B // 12)
                )[:B],
            }))
        # warmup + force the puts to complete
        yp, _ = eval_step(state, dev_batches[0])
        np.asarray(yp)
        t0 = time.perf_counter()
        for r in range(REPEATS):
            for b in dev_batches:
                yp, _ = eval_step(state, b)
        np.asarray(yp)  # one D2H sync at the end of the chain
        dt = time.perf_counter() - t0
        steps = REPEATS * N_BATCHES
        print(json.dumps({
            "batch": B,
            "img_per_sec": round(steps * B / dt, 1),
            "ms_per_batch": round(1000.0 * dt / steps, 2),
        }), flush=True)


if __name__ == "__main__":
    main()
