"""CLI smoke tests: prepare-data -> dictionary -> train -> evaluate."""

import json

import numpy as np
import pytest

from multi_modal_regression_tpu.cli import main

TINY_OVERRIDES = [
    "--feature-network", "resnet18", "--N0", "512", "--N1", "32",
    "--N2", "16", "--image-size", "32", "--items-per-batch", "2",
    "--num-epochs", "1", "--num-warmup-epochs", "1",
    "--max-iterations", "2", "--num-workers", "2",
]


@pytest.fixture(scope="module")
def data_root(tmp_path_factory):
    root = tmp_path_factory.mktemp("cli_data")
    rc = main([
        "prepare-data", "--out", str(root),
        "--images-per-class", "5", "--image-size", "32",
    ])
    assert rc == 0
    return root


@pytest.fixture(scope="module")
def dictionary_file(data_root, tmp_path_factory):
    out = tmp_path_factory.mktemp("dict") / "kmeans_4.npz"
    rc = main([
        "dictionary", "--type", "kmeans",
        "--data-root", str(data_root / "renderforcnn"),
        "--size", "4", "--out", str(out),
    ])
    assert rc == 0
    assert out.exists()
    return out


def test_dictionary_gmm(data_root, tmp_path):
    out = tmp_path / "gmm_3.npz"
    rc = main([
        "dictionary", "--type", "gmm",
        "--data-root", str(data_root / "renderforcnn"),
        "--size", "3", "--out", str(out),
    ])
    assert rc == 0
    with np.load(out) as f:
        assert f["means"].shape == (3, 3)


def test_train_and_evaluate(data_root, dictionary_file, tmp_path):
    workdir = tmp_path / "run"
    rc = main([
        "train", "--preset", "geodesic_bd",
        "--data-root", str(data_root),
        "--dictionary", str(dictionary_file),
        "--dict-size", "4",
        "--workdir", str(workdir),
        *TINY_OVERRIDES,
    ])
    assert rc == 0
    assert (workdir / "checkpoints" / "final").exists()
    assert (workdir / "metrics.jsonl").exists()
    records = [
        json.loads(line)
        for line in (workdir / "metrics.jsonl").read_text().splitlines()
    ]
    assert any("loss" in r for r in records)

    rc = main([
        "evaluate", "--preset", "geodesic_bd",
        "--data-root", str(data_root),
        "--dictionary", str(dictionary_file),
        "--dict-size", "4",
        "--workdir", str(workdir),
        "--checkpoint", "final",
        "--eval-num-epochs", "1",
        *TINY_OVERRIDES,
    ])
    assert rc == 0
    snaps = list((workdir / "results_run").glob("num*.npz"))
    assert snaps


def test_train_warm_start_classifier(data_root, dictionary_file, tmp_path):
    """The rene protocol: train a classifier, then warm-start a BD model's
    bin branch from it (learnSimpleBDModel_rene.py:89-130)."""
    clf_dir = tmp_path / "clf"
    rc = main([
        "train", "--preset", "classification",
        "--data-root", str(data_root),
        "--dictionary", str(dictionary_file),
        "--dict-size", "4",
        "--workdir", str(clf_dir),
        *TINY_OVERRIDES,
    ])
    assert rc == 0
    rc = main([
        "train", "--preset", "simple_bd",
        "--data-root", str(data_root),
        "--dictionary", str(dictionary_file),
        "--dict-size", "4",
        "--workdir", str(tmp_path / "bd"),
        "--warm-start-workdir", str(clf_dir),
        "--warm-start-preset", "classification",
        "--warm-start-kind", "classifier",
        *TINY_OVERRIDES,
    ])
    assert rc == 0


def test_train_data_selection(data_root, dictionary_file, tmp_path):
    """--train-data render trains from the render loader alone."""
    rc = main([
        "train", "--preset", "simple_bd",
        "--data-root", str(data_root),
        "--dictionary", str(dictionary_file),
        "--dict-size", "4",
        "--workdir", str(tmp_path / "render_only"),
        "--train-data", "render",
        *TINY_OVERRIDES,
    ])
    assert rc == 0


def test_predict_from_checkpoint(data_root, dictionary_file, tmp_path):
    workdir = tmp_path / "pred_run"
    base = [
        "--preset", "geodesic_bd",
        "--dictionary", str(dictionary_file),
        "--dict-size", "4",
        "--workdir", str(workdir),
        *TINY_OVERRIDES,
    ]
    assert main(["train", "--data-root", str(data_root), *base]) == 0
    assert main([
        "predict", "--data-root", str(data_root), "--checkpoint", "final",
        *base,
    ]) == 0
    import numpy as np

    files = list(workdir.glob("results_*.npz"))
    assert files
    with np.load(files[0]) as f:
        assert f["yhat_test"].shape[1] == 3

    # detected-bbox inference path
    from multi_modal_regression_tpu.tools.synthetic import generate_detection_set

    det = generate_detection_set(tmp_path / "vk_dets", num_images=3,
                                 image_size=32, num_classes=12)
    assert main([
        "predict", "--det-path", str(det), "--checkpoint", "final", *base,
    ]) == 0
    assert list(workdir.glob("results_*_vk_dets.mat"))


def test_train_resume(data_root, dictionary_file, tmp_path):
    workdir = tmp_path / "resume_run"
    base = [
        "train", "--preset", "simple_bd",
        "--data-root", str(data_root),
        "--dictionary", str(dictionary_file),
        "--dict-size", "4",
        "--workdir", str(workdir),
        *TINY_OVERRIDES,
    ]
    assert main(base) == 0
    # resume restores the saved state and continues without error
    assert main(base + ["--resume"]) == 0
