"""optimizer_dtype sweep on the real chip (round-3, VERDICT item 5).

Measures the geodesic_bd step (bench.py config) with f32 vs bf16 Adam
first-moment storage (presets.build_optimizer optimizer_dtype). The f32
Adam state traffic is ~1 GB of the ~23 GB/step floor; bf16 mu halves the
mu read+write (~0.7 GB expected saving, ~1-2%).

Usage: python benchmarks/bench_opt_dtype.py [float32 bfloat16 ...]
"""

from __future__ import annotations

import json
import pathlib
import sys
import time

sys.path.insert(0, str(pathlib.Path(__file__).resolve().parent.parent))

import numpy as np

BATCH = 96
IMAGE_SIZE = 224
WARMUP_STEPS = 3
MEASURE_STEPS = 40


def bench(opt_dtype: str, remat: str | None, rng) -> dict:
    import jax
    import jax.numpy as jnp

    from multi_modal_regression_tpu.dictionary.kmeans import KMeansDictionary
    from multi_modal_regression_tpu.parallel.mesh import make_mesh
    from multi_modal_regression_tpu.train import Trainer, get_config
    from multi_modal_regression_tpu.train.state import create_train_state

    cfg = get_config(
        "geodesic_bd",
        image_size=IMAGE_SIZE,
        items_per_batch=BATCH // 12,
        compute_dtype="bfloat16",
        optimizer_dtype=opt_dtype,
        remat=remat,
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
    batch = trainer.shard_batch({
        "xdata": rng.integers(
            0, 256, (BATCH, IMAGE_SIZE, IMAGE_SIZE, 3), np.uint8
        ),
        "euler": rng.uniform(-90, 90, (BATCH, 3)).astype(np.float32),
        "label": np.tile(np.arange(12, dtype=np.int32), BATCH // 12),
    })
    step_fn = trainer.train_step_fn("main")
    for _ in range(WARMUP_STEPS):
        state, metrics = step_fn(state, batch)
    float(metrics["loss"])
    t0 = time.perf_counter()
    for _ in range(MEASURE_STEPS):
        state, metrics = step_fn(state, batch)
    loss = float(metrics["loss"])
    dt = time.perf_counter() - t0
    return {
        "optimizer_dtype": opt_dtype,
        "remat": remat or "none",
        "img_per_sec": round(MEASURE_STEPS * BATCH / dt, 1),
        "ms_per_step": round(1000.0 * dt / MEASURE_STEPS, 2),
        "loss_final": round(loss, 4),
    }


def main() -> None:
    dtypes = sys.argv[1:] or ["float32", "bfloat16"]
    rng = np.random.default_rng(0)
    for d in dtypes:
        print(json.dumps(bench(d, None, rng)), flush=True)


if __name__ == "__main__":
    main()
