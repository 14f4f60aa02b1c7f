"""Worker process for the 2-process multi-host e2e test.

Launched by tests/test_multihost.py: two of these processes (4 virtual CPU
devices each) form one 8-device jax.distributed cluster over a localhost
coordinator and run real `geodesic_bd` train steps through the full
multi-host path — `parallel.multihost.initialize`, host-strided loaders,
`global_batch_from_local`, and the multi-host `Trainer.predict` gather.
The loss trajectory must match a single-process 8-device run over the
same data (SURVEY.md §2.4 DCN row; the reference has no distributed
anything — learnGeodesicBDModel.py:47-48 binds one GPU).

Not a pytest file (no test_ prefix); run as
  python tests/multihost_worker.py --process-id K --num-processes 2 ...
"""

from __future__ import annotations

import argparse
import json
import os
import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--process-id", type=int, required=True)
    ap.add_argument("--num-processes", type=int, required=True)
    ap.add_argument("--coordinator", type=str, required=True)
    ap.add_argument("--data-root", type=str, required=True)
    ap.add_argument("--out", type=str, required=True)
    ap.add_argument("--steps", type=int, default=2)
    args = ap.parse_args()

    if "xla_force_host_platform_device_count" not in os.environ.get(
        "XLA_FLAGS", ""
    ):
        os.environ["XLA_FLAGS"] = (
            os.environ.get("XLA_FLAGS", "")
            + " --xla_force_host_platform_device_count=4"
        )
    import jax

    jax.config.update("jax_platforms", "cpu")

    from multi_modal_regression_tpu.parallel.multihost import initialize

    count, idx = initialize(
        coordinator_address=args.coordinator,
        num_processes=args.num_processes,
        process_id=args.process_id,
    )
    assert count == args.num_processes, count
    assert len(jax.devices()) == 4 * count, jax.devices()
    assert len(jax.local_devices()) == 4

    import numpy as np

    from multi_modal_regression_tpu.data import (
        BalancedLoader,
        ClassBalancedIndex,
        FlatTestIndex,
        TestLoader,
    )
    from multi_modal_regression_tpu.dictionary.kmeans import KMeansDictionary
    from multi_modal_regression_tpu.metrics.pose_error import (
        mean_class_median_error,
    )
    from multi_modal_regression_tpu.train import Trainer, get_config
    from multi_modal_regression_tpu.train.trainer import _interleave

    classes = ("aeroplane", "bicycle", "boat")
    cfg = get_config(
        "geodesic_bd",
        feature_network="resnet18", feature_layer="layer4",
        num_classes=len(classes), N0=512, N1=32, N2=16,
        dict_size=5, image_size=32, items_per_batch=2, eval_batch=8,
        max_iterations=args.steps, eval_every=0,
    )
    rng = np.random.default_rng(3)
    centers = (0.7 * rng.standard_normal((5, 3))).astype(np.float32)
    trainer = Trainer(cfg, dictionary=KMeansDictionary(cluster_centers=centers))

    root = Path(args.data_root)
    hosts = dict(host_count=count, host_index=idx)
    # shuffle=False: the oracle comparison needs bit-identical row sets per
    # global step without coupling to the shuffle rng
    real = BalancedLoader(
        ClassBalancedIndex(str(root / "real"), "real", classes=classes),
        cfg.items_per_batch, cfg.image_size, shuffle=False, num_workers=2,
        **hosts,
    )
    render = BalancedLoader(
        ClassBalancedIndex(str(root / "render"), "render", classes=classes),
        cfg.items_per_batch, cfg.image_size, shuffle=False, num_workers=2,
        **hosts,
    )
    test = TestLoader(
        FlatTestIndex(str(root / "test"), classes=classes),
        cfg.eval_batch, cfg.image_size, num_workers=2, **hosts,
    )

    state = trainer.init_state(0)
    step_fn = trainer.train_step_fn("main")
    losses = []
    for batch in _interleave(real, render):
        gb = trainer.shard_batch(batch)  # global_batch_from_local path
        assert gb["xdata"].shape[0] == batch["xdata"].shape[0] * count
        state, metrics = step_fn(state, gb)
        losses.append(float(metrics["loss"]))
        if len(losses) >= args.steps:
            break

    # multi-host predict: per-host local inference + process allgather
    ytrue, ypred, labels = trainer.predict(state, test)
    med = mean_class_median_error(
        ytrue, ypred, labels, cfg.num_classes, representation="axis_angle"
    )

    # the snapshot-ensemble evaluator (the `cli evaluate` protocol) through
    # the same cluster: cyclical-SGD fine-tune over global batches +
    # snapshots via the multi-host predict gather
    from multi_modal_regression_tpu.train import SnapshotEnsembleEvaluator

    ev = SnapshotEnsembleEvaluator(trainer, cycle_len=2)
    ev.run(state, real, render, test, num_epochs=1)
    ens_med, _ = ev.ensemble()

    result = {
        "process_id": idx,
        "losses": losses,
        "n_test": int(len(labels)),
        "med_err": float(med),
        # head of the gathered ytrue/labels: the stride-inverse reorder
        # must reproduce single-host row order exactly
        "ytrue_head": np.asarray(ytrue[:6], np.float64).tolist(),
        "labels_head": np.asarray(labels[:6]).tolist(),
        "n_snapshots": len(ev.snapshots),
        "ensembled_med_err": float(ens_med),
    }
    Path(args.out).write_text(json.dumps(result))
    print(json.dumps(result), flush=True)


if __name__ == "__main__":
    main()
