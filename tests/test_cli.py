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
