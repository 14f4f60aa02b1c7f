"""Bench heavy model variants on the real chip (VERDICT round-1 item 9).

Measures the multires OneDeltaPerBinModel (classes x clusters = 2400 delta
heads, the tensor-parallelism-motivating config in SCALING.md) and the
quaternion BD variant, same protocol as bench.py (chained donated state,
final D2H scalar as the sync).

Usage: python benchmarks/bench_variants.py [--batch N] [preset ...]
"""

import json
import pathlib
import sys
import time

sys.path.insert(0, str(pathlib.Path(__file__).resolve().parent.parent))

import numpy as np

IMAGE_SIZE = 224
BATCH = 96
WARMUP = 3
MEASURE = 20


def bench_preset(preset: str, bsz: int = BATCH, **overrides):
    import jax
    import jax.numpy as jnp

    from multi_modal_regression_tpu.dictionary.kmeans import KMeansDictionary
    from multi_modal_regression_tpu.parallel.mesh import make_mesh
    from multi_modal_regression_tpu.train import Trainer, get_config
    from multi_modal_regression_tpu.train.state import create_train_state

    rng = np.random.default_rng(0)
    cfg = get_config(
        preset, image_size=IMAGE_SIZE, items_per_batch=bsz // 12,
        compute_dtype="bfloat16", **overrides,
    )
    # dictionaries are axis-angle (K, 3) for every preset; the quaternion
    # problems convert internally (problems.py convert_dictionary)
    centers = (
        0.8 * rng.standard_normal((cfg.dict_size, 3))
    ).astype(np.float32)
    trainer = Trainer(
        cfg, dictionary=KMeansDictionary(cluster_centers=centers),
        mesh=make_mesh(jax.devices()[:1]),
    )
    model = trainer.model
    x0 = jnp.zeros((2, IMAGE_SIZE, IMAGE_SIZE, 3), jnp.float32)
    l0 = jnp.zeros((2,), jnp.int32)
    variables = jax.jit(lambda k: model.init(k, x0, l0, train=False))(
        jax.random.PRNGKey(cfg.seed)
    )
    n_params = sum(
        int(np.prod(p.shape))
        for p in jax.tree_util.tree_leaves(variables["params"])
    )
    state = create_train_state(variables, trainer.tx)
    batch = trainer.shard_batch({
        "xdata": rng.integers(
            0, 256, (bsz, IMAGE_SIZE, IMAGE_SIZE, 3), np.uint8
        ),
        "euler": rng.uniform(-90, 90, (bsz, 3)).astype(np.float32),
        "label": (np.arange(bsz) % 12).astype(np.int32),
    })
    step_fn = trainer.train_step_fn("main")
    for _ in range(WARMUP):
        state, metrics = step_fn(state, batch)
    float(metrics["loss"])  # D2H sync (tunnel: block_until_ready is a no-op)
    t0 = time.perf_counter()
    for _ in range(MEASURE):
        state, metrics = step_fn(state, batch)
    float(metrics["loss"])
    dt = time.perf_counter() - t0
    return {
        "preset": preset,
        "batch": bsz,
        "params_millions": round(n_params / 1e6, 1),
        "images_per_sec_chip": round(MEASURE * bsz / dt, 1),
        "ms_per_step": round(dt / MEASURE * 1e3, 1),
    }


def main():
    argv = sys.argv[1:]
    batch = BATCH
    if argv and argv[0] == "--batch":
        batch = int(argv[1])
        argv = argv[2:]
    presets = argv or ["geodesic_bd_quaternion", "geodesic_bd_multires"]
    for preset in presets:
        try:
            print(json.dumps(bench_preset(preset, bsz=batch)), flush=True)
        except Exception as e:  # keep going; record the failure
            print(json.dumps({"preset": preset, "error": str(e)[:300]}),
                  flush=True)


if __name__ == "__main__":
    main()
