"""Rematerialization sweep on the real chip (round-3 perf experiment).

Measures the geodesic_bd train step (the bench.py config: ResNet50-layer4,
batch 96, 224 px, bf16) under every remat policy (train/remat.py). The
step is HBM-bound with the MXU ~60% idle (BASELINE.md round-2 roofline);
jax.checkpoint policies trade that idle compute for the saved-activation
traffic the 23 GB/step floor assumes — the one semantics-exact lever the
round-2 analysis left untried.

Protocol identical to bench.py: donated chained state, warmup, N measured
steps, one final D2H loss fetch as the true sync (block_until_ready does
not synchronize through the axon tunnel).

Usage: python benchmarks/bench_remat.py [mode ...]   (default: all modes)
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

ALL_MODES = ("none", "block", "stage", "conv", "dots", "nothing")


def bench_mode(mode: str, rng: np.ndarray) -> dict:
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
        remat=None if mode == "none" else mode,
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
    batch = {
        "xdata": rng.integers(
            0, 256, (BATCH, IMAGE_SIZE, IMAGE_SIZE, 3), np.uint8
        ),
        "euler": rng.uniform(-90, 90, (BATCH, 3)).astype(np.float32),
        "label": np.tile(np.arange(12, dtype=np.int32), BATCH // 12),
    }
    batch = trainer.shard_batch(batch)
    step_fn = trainer.train_step_fn("main")

    t_c = time.perf_counter()
    for _ in range(WARMUP_STEPS):
        state, metrics = step_fn(state, batch)
    loss0 = float(metrics["loss"])
    compile_s = time.perf_counter() - t_c

    t0 = time.perf_counter()
    for _ in range(MEASURE_STEPS):
        state, metrics = step_fn(state, batch)
    loss1 = float(metrics["loss"])
    dt = time.perf_counter() - t0

    img_s = MEASURE_STEPS * BATCH / dt
    return {
        "mode": mode,
        "img_per_sec": round(img_s, 1),
        "ms_per_step": round(1000.0 * dt / MEASURE_STEPS, 2),
        "compile_plus_warmup_s": round(compile_s, 1),
        "loss_after_warmup": round(loss0, 4),
        "loss_final": round(loss1, 4),
    }


def main() -> None:
    modes = sys.argv[1:] or list(ALL_MODES)
    rng = np.random.default_rng(0)
    results = []
    for mode in modes:
        r = bench_mode(mode, rng)
        results.append(r)
        print(json.dumps(r), flush=True)
    best = max(results, key=lambda r: r["img_per_sec"])
    print(
        json.dumps({"best_mode": best["mode"], "best_img_per_sec": best["img_per_sec"]}),
        flush=True,
    )


if __name__ == "__main__":
    main()
