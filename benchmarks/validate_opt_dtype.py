"""On-chip learning validation for optimizer_dtype=bfloat16 (round 3).

Trains geodesic_bd (ResNet18, 64 px, bf16 compute) on the synthetic
pose-pattern set with f32 vs bf16 Adam first-moment storage and compares
the train-view MedErr trajectory (the BASELINE.md round-1 protocol).
Batches are staged on device once and cycled, so the measurement is
device-bound rather than tunnel-H2D-bound.

Usage: python benchmarks/validate_opt_dtype.py [steps]
"""

from __future__ import annotations

import json
import pathlib
import sys
import tempfile
import time

sys.path.insert(0, str(pathlib.Path(__file__).resolve().parent.parent))

import numpy as np

IMAGE_SIZE = 64
STEPS_DEFAULT = 360


def run(opt_dtype: str, steps: int, data_root, centers) -> dict:
    import jax
    import jax.numpy as jnp

    from multi_modal_regression_tpu.data import (
        BalancedLoader,
        ClassBalancedIndex,
        FlatTestIndex,
        TestLoader,
    )
    from multi_modal_regression_tpu.dictionary.kmeans import KMeansDictionary
    from multi_modal_regression_tpu.parallel.mesh import make_mesh
    from multi_modal_regression_tpu.train import Trainer, get_config

    cfg = get_config(
        "geodesic_bd",
        feature_network="resnet18",
        image_size=IMAGE_SIZE,
        items_per_batch=8,
        dict_size=16,
        compute_dtype="bfloat16",
        optimizer_dtype=opt_dtype,
        train_flip=True,
        eval_every=0,
    )
    trainer = Trainer(
        cfg,
        dictionary=KMeansDictionary(cluster_centers=centers),
        mesh=make_mesh(jax.devices()[:1]),
    )
    real = BalancedLoader(
        ClassBalancedIndex(str(data_root), "real"),
        cfg.items_per_batch, IMAGE_SIZE, num_workers=8, seed=0,
    )
    test = TestLoader(
        FlatTestIndex(str(data_root)), cfg.eval_batch, IMAGE_SIZE,
        num_workers=8,
    )
    # stage distinct batches on device once; cycle them (tunnel H2D is
    # ~25 MB/s — BASELINE.md; cycling keeps the run device-bound)
    host_batches = []
    for batch in real:
        host_batches.append(trainer.shard_batch(batch))
        if len(host_batches) >= 8:
            break
    state = trainer.init_state(0)
    med0 = trainer.evaluate(state, test)
    step_fn = trainer.train_step_fn("main")
    t0 = time.perf_counter()
    for i in range(steps):
        state, metrics = step_fn(state, host_batches[i % len(host_batches)])
    loss = float(metrics["loss"])
    dt = time.perf_counter() - t0
    med1 = trainer.evaluate(state, test)
    return {
        "optimizer_dtype": opt_dtype,
        "steps": steps,
        "med_err_before": round(float(med0), 2),
        "med_err_after": round(float(med1), 2),
        "final_loss": round(loss, 4),
        "img_per_sec": round(
            steps * len(host_batches[0]["label"]) / dt, 1
        ),
    }


def main() -> None:
    steps = int(sys.argv[1]) if len(sys.argv) > 1 else STEPS_DEFAULT
    from multi_modal_regression_tpu.tools.synthetic import (
        generate_pose_dataset,
    )

    rng = np.random.default_rng(0)
    centers = (0.8 * rng.standard_normal((16, 3))).astype(np.float32)
    with tempfile.TemporaryDirectory() as td:
        root = generate_pose_dataset(
            pathlib.Path(td) / "pose", images_per_class=60,
            image_size=IMAGE_SIZE, seed=7, pattern="pose",
        )
        for d in ("float32", "bfloat16"):
            print(json.dumps(run(d, steps, root, centers)), flush=True)


if __name__ == "__main__":
    main()
