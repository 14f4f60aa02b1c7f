"""Global-batch scale-out convergence experiment (round 4, SCALING.md).

Runs geodesic_bd on the synthetic pose-pattern set over the virtual
8-device CPU mesh at base batch vs 8x batch under the candidate LR rules,
at matched EPOCHS and matched STEPS. The recorded result (SCALING.md
"Scale-out training recipe"): with Adam, every matched-epochs LR rule
loses to unscaled, and unscaled-at-matched-epochs loses to the small
batch — progress is step-bound; at matched STEPS the 8x batch with
UNSCALED LR is strictly better. Recipe: scale steps, not LR.

Usage: python benchmarks/bench_lr_scaling.py [--quick]
(host-only: forces CPU + an 8-device mesh; never touches the TPU)
"""

from __future__ import annotations

import argparse
import json
import pathlib
import sys
import tempfile
import time

sys.path.insert(0, str(pathlib.Path(__file__).resolve().parent.parent))

import os

os.environ.setdefault("XLA_FLAGS", "--xla_force_host_platform_device_count=8")
import jax

jax.config.update("jax_platforms", "cpu")

import numpy as np  # noqa: E402

CLASSES = ("aeroplane", "bicycle", "boat", "bottle")


def run(root, centers, items_per_batch, lr_scaling, epochs) -> dict:
    from multi_modal_regression_tpu.data import (
        BalancedLoader,
        ClassBalancedIndex,
        FlatTestIndex,
        TestLoader,
    )
    from multi_modal_regression_tpu.dictionary.kmeans import KMeansDictionary
    from multi_modal_regression_tpu.train import Trainer, get_config

    cfg = get_config(
        "geodesic_bd",
        feature_network="resnet18", feature_layer="layer4",
        num_classes=len(CLASSES), N0=512, N1=32, N2=16,
        dict_size=8, image_size=32, items_per_batch=items_per_batch,
        num_warmup_epochs=1, num_epochs=epochs, init_lr=1e-3,
        lr_scaling=lr_scaling, eval_batch=32, eval_every=0, seed=0,
    )
    trainer = Trainer(cfg, dictionary=KMeansDictionary(cluster_centers=centers))
    real = BalancedLoader(
        ClassBalancedIndex(str(root), "real", classes=CLASSES),
        cfg.items_per_batch, 32, num_workers=4, seed=0,
    )
    test = TestLoader(
        FlatTestIndex(str(root), classes=CLASSES), 32, 32, num_workers=4
    )
    t0 = time.time()
    state = trainer.init_state()
    state = trainer.fit(state, real, None, test_loader=None)
    med = trainer.evaluate(state, test)
    out = {
        "items_per_batch": items_per_batch,
        "lr_scaling": lr_scaling,
        "epochs": epochs,
        "steps": int(state.step),
        "med_err_deg": round(float(med), 1),
        "seconds": round(time.time() - t0, 0),
    }
    print(json.dumps(out), flush=True)
    return out


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--quick", action="store_true",
                    help="matched-steps comparison only")
    args = ap.parse_args()

    from multi_modal_regression_tpu.tools.synthetic import generate_pose_dataset

    rng = np.random.default_rng(0)
    centers = (0.8 * rng.standard_normal((8, 3))).astype(np.float32)
    with tempfile.TemporaryDirectory() as td:
        root = generate_pose_dataset(
            pathlib.Path(td) / "pose", classes=CLASSES, images_per_class=48,
            image_size=32, seed=5, pattern="pose",
        )
        if not args.quick:
            run(root, centers, 2, "none", 4)        # base: 120 steps
            run(root, centers, 16, "linear", 4)     # matched epochs
            run(root, centers, 16, "sqrt", 4)
            run(root, centers, 16, "none", 4)
        run(root, centers, 16, "none", 32)          # matched steps
        run(root, centers, 16, "sqrt", 32)


if __name__ == "__main__":
    main()
