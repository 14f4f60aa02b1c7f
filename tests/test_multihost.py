"""Multi-host SPMD executed for real: a 2-process CPU cluster e2e test.

Launches two subprocesses (tests/multihost_worker.py) with 4 virtual CPU
devices each, joined into one 8-device cluster via jax.distributed over a
localhost coordinator. Each worker runs genuine geodesic_bd train steps
through `parallel.multihost.initialize` + host-strided loaders +
`global_batch_from_local`, then the multi-host `Trainer.predict`
(per-host local eval + process allgather). The loss trajectory must match
a single-process 8-device run over the same data — the strides partition
the same global batches, and the loss/BN reductions are row-permutation
invariant.

This makes parallel/multihost.py EXECUTED code (SURVEY.md §2.4 DCN row);
the reference has nothing distributed to compare against
(learnGeodesicBDModel.py:47-48 binds a single GPU).
"""

from __future__ import annotations

import json
import os
import socket
import subprocess
import sys
from pathlib import Path

import numpy as np
import pytest

from multi_modal_regression_tpu.tools.synthetic import generate_pose_dataset

CLASSES = ("aeroplane", "bicycle", "boat")
STEPS = 2


def _free_port() -> int:
    with socket.socket() as s:
        s.bind(("127.0.0.1", 0))
        return s.getsockname()[1]


# Cluster bring-up failure signatures that warrant a relaunch on a fresh
# port rather than a test failure. The Gloo one is a hardcoded 30 s
# peer-exchange deadline inside jaxlib racing process skew on a loaded
# single-CPU box (see parallel/multihost.py initialize docstring); the
# coordinator one is the matching connect-phase timeout. Deliberately
# NARROW: a bare "DEADLINE_EXCEEDED" also appears in post-training
# shutdown BarrierErrors, where a relaunch would re-run a job whose
# writes already landed.
BRINGUP_SIGNATURES = (
    "Gloo context initialization failed",
    "Failed to connect to coordination service",
)
# a failed process that printed any of these got PAST bring-up — never
# relaunch it, whatever else its output matches
PROGRESS_MARKERS = ("[warmup]", "[main]", "final MedErr", "losses")


def _launch_cluster_with_retry(build, attempts: int = 3):
    """build(port) -> (returncodes, outputs) for a 2-process cluster.

    Retries (fresh port) when a nonzero exit carries a known bring-up
    signature AND no process shows training progress; any other failure,
    or exhaustion, asserts with the output. Bring-up failures fire before
    the workers do any training or filesystem writes, so relaunch is
    idempotent."""
    for attempt in range(attempts):
        rcs, outputs = build(_free_port())
        if all(rc == 0 for rc in rcs):
            return outputs
        flaky = any(
            sig in out for out in outputs for sig in BRINGUP_SIGNATURES
        ) and not any(
            marker in out for out in outputs for marker in PROGRESS_MARKERS
        )
        if flaky and attempt + 1 < attempts:
            print(
                f"cluster bring-up flake (attempt {attempt + 1}); relaunching"
            )
            continue
        for pid, (rc, out) in enumerate(zip(rcs, outputs)):
            assert rc == 0, f"proc {pid} failed (rc={rc}):\n{out[-4000:]}"
    raise AssertionError("unreachable")


def _communicate_all(procs, timeout: int = 900):
    outputs = []
    for p in procs:
        try:
            out, _ = p.communicate(timeout=timeout)
        except subprocess.TimeoutExpired:
            for q in procs:
                q.kill()
            raise
        outputs.append(out)
    return [p.returncode for p in procs], outputs


@pytest.fixture(scope="module")
def dataset(tmp_path_factory):
    root = tmp_path_factory.mktemp("mh_data")
    for sub, seed in (("real", 11), ("render", 12), ("test", 13)):
        generate_pose_dataset(
            root / sub, classes=CLASSES, images_per_class=8,
            image_size=32, seed=seed,
        )
    return root


@pytest.fixture(scope="module")
def worker_results(dataset, tmp_path_factory):
    out_dir = tmp_path_factory.mktemp("mh_out")
    env = dict(os.environ)
    env["XLA_FLAGS"] = "--xla_force_host_platform_device_count=4"

    def build(port):
        procs = []
        for pid in range(2):
            procs.append(
                subprocess.Popen(
                    [
                        sys.executable,
                        str(Path(__file__).parent / "multihost_worker.py"),
                        "--process-id", str(pid),
                        "--num-processes", "2",
                        "--coordinator", f"127.0.0.1:{port}",
                        "--data-root", str(dataset),
                        "--out", str(out_dir / f"proc{pid}.json"),
                        "--steps", str(STEPS),
                    ],
                    env=env,
                    stdout=subprocess.PIPE,
                    stderr=subprocess.STDOUT,
                    text=True,
                )
            )
        return _communicate_all(procs)

    _launch_cluster_with_retry(build)
    return [
        json.loads((out_dir / f"proc{pid}.json").read_text())
        for pid in range(2)
    ]


def _oracle_losses_and_med(dataset):
    """Single-process 8-device run over the same global batches: the two
    hosts' item strides ([0,1] and [2,3] per step) together are exactly
    items [0:4] — items_per_batch=4 with shuffle=False reproduces them
    (row order differs; the reductions are permutation-invariant)."""
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

    cfg = get_config(
        "geodesic_bd",
        feature_network="resnet18", feature_layer="layer4",
        num_classes=len(CLASSES), N0=512, N1=32, N2=16,
        dict_size=5, image_size=32, items_per_batch=4, eval_batch=8,
        max_iterations=STEPS, eval_every=0,
    )
    rng = np.random.default_rng(3)
    centers = (0.7 * rng.standard_normal((5, 3))).astype(np.float32)
    trainer = Trainer(cfg, dictionary=KMeansDictionary(cluster_centers=centers))
    real = BalancedLoader(
        ClassBalancedIndex(str(dataset / "real"), "real", classes=CLASSES),
        cfg.items_per_batch, cfg.image_size, shuffle=False, num_workers=2,
    )
    render = BalancedLoader(
        ClassBalancedIndex(str(dataset / "render"), "render", classes=CLASSES),
        cfg.items_per_batch, cfg.image_size, shuffle=False, num_workers=2,
    )
    test = TestLoader(
        FlatTestIndex(str(dataset / "test"), classes=CLASSES),
        cfg.eval_batch, cfg.image_size, num_workers=2,
    )
    state = trainer.init_state(0)
    step_fn = trainer.train_step_fn("main")
    losses = []
    for batch in _interleave(real, render):
        state, metrics = step_fn(state, trainer.shard_batch(batch))
        losses.append(float(metrics["loss"]))
        if len(losses) >= STEPS:
            break
    ytrue, ypred, labels = trainer.predict(state, test)
    med = mean_class_median_error(
        ytrue, ypred, labels, cfg.num_classes, representation="axis_angle"
    )
    return losses, float(med), len(labels), ytrue[:6], labels[:6]


def test_two_process_cluster_matches_single_process(dataset, worker_results):
    r0, r1 = worker_results
    # every process computes the same global losses (replicated metrics)
    np.testing.assert_allclose(r0["losses"], r1["losses"], rtol=1e-6)
    assert len(r0["losses"]) == STEPS
    # predict allgather: both processes reconstruct the FULL test set
    # (generate_pose_dataset varies per-class counts: 8+9+10 images)
    assert r0["n_test"] == r1["n_test"] == 27
    np.testing.assert_allclose(r0["med_err"], r1["med_err"], rtol=1e-6)
    # the snapshot-ensemble evaluator also ran through the cluster
    assert r0["n_snapshots"] == r1["n_snapshots"] >= 1
    np.testing.assert_allclose(
        r0["ensembled_med_err"], r1["ensembled_med_err"], rtol=1e-6
    )
    assert np.isfinite(r0["ensembled_med_err"])

    oracle_losses, oracle_med, n, oracle_ytrue, oracle_labels = (
        _oracle_losses_and_med(dataset)
    )
    assert n == 27
    # same global batches, row order permuted between the two setups: the
    # loss must match to reduction-reordering noise
    np.testing.assert_allclose(r0["losses"], oracle_losses, rtol=2e-3)
    np.testing.assert_allclose(r0["med_err"], oracle_med, rtol=2e-2, atol=0.5)
    # stride-inverse gather: rows come back in test-set index order,
    # matching the single-host predict row-for-row
    np.testing.assert_array_equal(r0["labels_head"], oracle_labels)
    np.testing.assert_allclose(
        np.asarray(r0["ytrue_head"]), oracle_ytrue, rtol=1e-4, atol=1e-5
    )


def test_cli_train_distributed_two_processes(dataset, tmp_path):
    """`cli train --distributed` end-to-end on the 2-process cluster: the
    full command-line path (initialize -> strided loaders -> fit ->
    multi-host evaluate -> process-0-only checkpoint/metrics writes)."""
    from multi_modal_regression_tpu.dictionary.kmeans import KMeansDictionary

    port = _free_port()
    workdir = tmp_path / "cli_run"
    rng = np.random.default_rng(5)
    dict_path = tmp_path / "km.npz"
    KMeansDictionary(
        cluster_centers=(0.7 * rng.standard_normal((4, 3))).astype(np.float32)
    ).save(dict_path)
    import scipy.io as spio

    dbinfo = tmp_path / "dbinfo.mat"
    spio.savemat(str(dbinfo), {"classes": np.array(CLASSES)})
    env = dict(os.environ)
    # filter ONLY the axon sitecustomize entry (it overrides JAX_PLATFORMS;
    # the CLI subprocess cannot call jax.config.update first), keep the
    # rest of PYTHONPATH, and prepend the repo root
    kept = [
        p for p in env.get("PYTHONPATH", "").split(os.pathsep)
        if p and "axon_site" not in p
    ]
    env["PYTHONPATH"] = os.pathsep.join(
        [str(Path(__file__).parent.parent), *kept]
    )
    env["JAX_PLATFORMS"] = "cpu"
    env["XLA_FLAGS"] = "--xla_force_host_platform_device_count=4"
    def launch(extra):
        def build(run_port):
            procs = []
            for pid in range(2):
                procs.append(
                    subprocess.Popen(
                        [
                            sys.executable, "-m",
                            "multi_modal_regression_tpu.cli",
                            "train", "--preset", "geodesic_bd",
                            "--dictionary", str(dict_path),
                            "--dbinfo", str(dbinfo),
                            "--distributed",
                            "--coordinator-address", f"127.0.0.1:{run_port}",
                            "--num-processes", "2", "--process-id", str(pid),
                            "--data-root", str(dataset),
                            "--real-subdir", "real", "--render-subdir", "render",
                            "--test-subdir", "test",
                            "--save-str", "mh", "--workdir", str(workdir),
                            "--num-classes", "3",
                            "--feature-network", "resnet18", "--N0", "512",
                            "--N1", "16", "--N2", "8", "--dict-size", "4",
                            "--image-size", "32", "--items-per-batch", "2",
                            "--max-iterations", "1", "--num-epochs", "1",
                            "--num-warmup-epochs", "1", "--num-workers", "2",
                        # subprocesses don't inherit the conftest's
                        # in-process cache config; keep them off the real
                        # ~/.cache and on the warm test cache
                            "--compile-cache", "/tmp/jax_test_compile_cache",
                            *extra,
                        ],
                        env=env, cwd=str(Path(__file__).parent.parent),
                        stdout=subprocess.PIPE, stderr=subprocess.STDOUT,
                        text=True,
                    )
                )
            return _communicate_all(procs)

        outputs = _launch_cluster_with_retry(build)
        for pid, out in enumerate(outputs):
            assert f"distributed: process {pid}/2" in out
            assert "final MedErr" in out
        return outputs

    launch([])
    # exactly one process wrote the checkpoint and metrics
    assert (workdir / "checkpoints" / "final").exists()
    assert (workdir / "metrics.jsonl").exists()

    # resume in a NEW 2-process cluster: every process restores the
    # distributed-saved checkpoint (orbax round trip) and trains on
    outputs = launch(["--resume"])
    assert all("resumed from step 2" in out for out in outputs)
