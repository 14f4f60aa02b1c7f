"""On-chip learning validation for the frozen_bn fine-tune mode (round 4).

The frozen-BN semantics target FINE-TUNING a converged model (the
snapshot-ensemble protocol; model.eval() precedent in
learnSimpleBDModel_rene.py:133), so the protocol here is two-stage:
train geodesic_bd normally for `steps` steps on the synthetic
pose-pattern set, then fine-tune for `steps//2` more steps twice from the
SAME state — once with train-mode BN, once with frozen BN — and compare
the resulting train-view MedErr. A healthy fast mode tracks the
train-mode fine-tune; degradation means the mode must stay a flagged
opt-in only.

Usage: python benchmarks/validate_frozen_bn.py [steps]
"""

from __future__ import annotations

import dataclasses
import json
import pathlib
import sys
import tempfile
import time

sys.path.insert(0, str(pathlib.Path(__file__).resolve().parent.parent))

import numpy as np

IMAGE_SIZE = 64
STEPS_DEFAULT = 360


def main() -> None:
    steps = int(sys.argv[1]) if len(sys.argv) > 1 else STEPS_DEFAULT

    import jax

    from multi_modal_regression_tpu.data import (
        BalancedLoader,
        ClassBalancedIndex,
        FlatTestIndex,
        TestLoader,
    )
    from multi_modal_regression_tpu.dictionary.kmeans import KMeansDictionary
    from multi_modal_regression_tpu.parallel.mesh import make_mesh
    from multi_modal_regression_tpu.tools.synthetic import generate_pose_dataset
    from multi_modal_regression_tpu.train import Trainer, get_config

    rng = np.random.default_rng(0)
    centers = (0.8 * rng.standard_normal((16, 3))).astype(np.float32)
    with tempfile.TemporaryDirectory() as td:
        root = generate_pose_dataset(
            pathlib.Path(td) / "pose", images_per_class=60,
            image_size=IMAGE_SIZE, seed=7, pattern="pose",
        )
        cfg = get_config(
            "geodesic_bd",
            feature_network="resnet18", image_size=IMAGE_SIZE,
            items_per_batch=8, dict_size=16, compute_dtype="bfloat16",
            train_flip=True, eval_every=0,
        )
        dictionary = KMeansDictionary(cluster_centers=centers)
        mesh = make_mesh(jax.devices()[:1])
        trainer = Trainer(cfg, dictionary=dictionary, mesh=mesh)
        real = BalancedLoader(
            ClassBalancedIndex(str(root), "real"),
            cfg.items_per_batch, IMAGE_SIZE, num_workers=8, seed=0,
        )
        test = TestLoader(
            FlatTestIndex(str(root)), cfg.eval_batch, IMAGE_SIZE,
            num_workers=8,
        )
        batches = []
        for batch in real:
            batches.append(trainer.shard_batch(batch))
            if len(batches) >= 8:
                break

        # stage 1: normal training to a partly converged state
        state = trainer.init_state(0)
        step_fn = trainer.train_step_fn("main")
        for i in range(steps):
            state, _ = step_fn(state, batches[i % len(batches)])
        med_mid = trainer.evaluate(state, test)
        base = jax.device_get(state)
        print(json.dumps({
            "phase": "pretrain", "steps": steps,
            "med_err": round(float(med_mid), 2),
        }), flush=True)

        # stage 2: fine-tune from the same state, both BN modes
        for frozen in (False, True):
            t = Trainer(
                dataclasses.replace(cfg, frozen_bn=frozen),
                dictionary=dictionary, mesh=mesh,
            )
            st = jax.device_put(base)
            fn = t.train_step_fn("main")
            t0 = time.perf_counter()
            n = steps // 2
            for i in range(n):
                st, metrics = fn(st, batches[(steps + i) % len(batches)])
            loss = float(metrics["loss"])
            dt = time.perf_counter() - t0
            med = t.evaluate(st, test)
            print(json.dumps({
                "phase": "finetune", "frozen_bn": frozen, "steps": n,
                "med_err_after": round(float(med), 2),
                "final_loss": round(loss, 4),
                "img_per_sec": round(n * len(batches[0]["label"]) / dt, 1),
            }), flush=True)


if __name__ == "__main__":
    main()
