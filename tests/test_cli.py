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


def test_dictionary_dbinfo_and_db_type(pascal3d_release, tmp_path):
    """`dictionary --dbinfo/--db-type`: non-default class sets learn from
    their own trees (previously library-only — the CLI walked the 12
    default classes and crashed on 3-class datasets), and the real-tree
    tilt-sign convention flips ct (dataGenerators.py:57-62)."""
    import numpy as np

    _, _, out = pascal3d_release
    d_real = tmp_path / "k_real.npz"
    rc = main([
        "dictionary", "--data-root", str(out / "train"),
        "--size", "4", "--out", str(d_real),
        "--dbinfo", str(out / "dbinfo.mat"), "--db-type", "real",
    ])
    assert rc == 0 and d_real.exists()
    d_render = tmp_path / "k_render.npz"
    rc = main([
        "dictionary", "--data-root", str(out / "train"),
        "--size", "4", "--out", str(d_render),
        "--dbinfo", str(out / "dbinfo.mat"), "--db-type", "render",
    ])
    assert rc == 0
    a = np.load(d_real)["cluster_centers"]
    b = np.load(d_render)["cluster_centers"]
    assert a.shape == b.shape == (4, 3)
    # the tilt sign flips the gathered poses -> different dictionaries
    assert not np.allclose(np.sort(a.ravel()), np.sort(b.ravel()))


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


def test_class_subset_pipeline_finite_losses(tmp_path):
    """--num-classes N without --dbinfo means the FIRST N PASCAL3D+ classes
    end to end: prepare-data honors --classes, dictionary/train agree on
    the same subset, and every logged train loss is FINITE. Regression
    test for a real bug a verify drive found: the train CLI used to index
    the full 12-class list regardless of --num-classes, so labels 4..11
    gathered out of the 4-head bank and the fill semantics turned every
    loss NaN (silently — the run completed)."""
    root = tmp_path / "data"
    rc = main([
        "prepare-data", "--out", str(root),
        "--classes", "aeroplane,bicycle,boat,bottle",
        "--images-per-class", "5", "--image-size", "32",
    ])
    assert rc == 0
    import os

    assert sorted(os.listdir(root / "augmented2")) == [
        "aeroplane", "bicycle", "boat", "bottle"
    ]
    dict_file = tmp_path / "kmeans.npz"
    rc = main([
        "dictionary", "--type", "kmeans",
        "--data-root", str(root / "renderforcnn"),
        "--size", "4", "--num-classes", "4", "--out", str(dict_file),
    ])
    assert rc == 0
    workdir = tmp_path / "run"
    rc = main([
        "train", "--preset", "geodesic_regression",
        "--data-root", str(root),
        "--dictionary", str(dict_file),
        "--num-classes", "4",
        "--workdir", str(workdir),
        *TINY_OVERRIDES,
    ])
    assert rc == 0
    records = [
        json.loads(line)
        for line in (workdir / "metrics.jsonl").read_text().splitlines()
    ]
    losses = [r["loss"] for r in records if "loss" in r]
    assert losses and all(np.isfinite(losses))


def test_num_classes_dbinfo_mismatch_is_loud(tmp_path, pascal3d_release):
    """--dbinfo naming a different class count than --num-classes must be
    a clear CLI error, not NaN training (the index's labels have to match
    the per-class head bank exactly)."""
    _, _, out = pascal3d_release
    with pytest.raises(SystemExit):
        main([
            "train", "--preset", "geodesic_regression",
            "--data-root", str(out),
            "--dbinfo", str(out / "dbinfo.mat"),
            "--num-classes", "2",
            "--workdir", str(tmp_path / "run"),
            *TINY_OVERRIDES,
        ])


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


def test_predict_joint_analysis(data_root, dictionary_file, tmp_path):
    """`predict --analysis`: the evaluateJointModel[2].py protocol — one
    combined .mat with `<name>_results` structs, per-class pose decodes
    (B, ndim, num_classes) + category argmax per checkpoint."""
    import scipy.io as spio

    workdir = tmp_path / "joint_analysis"
    base = [
        "--preset", "joint_cat_pose_top1",
        "--dictionary", str(dictionary_file),
        "--dict-size", "4",
        "--workdir", str(workdir),
        *TINY_OVERRIDES,
    ]
    assert main(["train", "--data-root", str(data_root), *base]) == 0
    assert main([
        "predict", "--data-root", str(data_root), "--analysis",
        "--checkpoint", "final,final", "--analysis-names", "pose,top1",
        *base,
    ]) == 0
    files = list(workdir.glob("results_*_analysis.mat"))
    assert files
    tmp = spio.loadmat(str(files[0]), squeeze_me=True)
    assert {"pose_results", "top1_results"} <= set(tmp)
    r = tmp["pose_results"]
    ypred_pose = np.asarray(r["ypred_pose"].item())
    n = len(np.asarray(r["ytrue_cat"].item()).ravel())
    assert n > 0 and ypred_pose.shape == (n, 3, 12)
    # the two runs restored the same checkpoint -> identical dumps
    np.testing.assert_array_equal(
        ypred_pose, np.asarray(tmp["top1_results"]["ypred_pose"].item())
    )
    # non-joint presets refuse the flag loudly
    with pytest.raises(SystemExit):
        main([
            "predict", "--data-root", str(data_root), "--analysis",
            "--checkpoint", "final",
            "--preset", "geodesic_bd", "--dictionary", str(dictionary_file),
            "--dict-size", "4", "--workdir", str(workdir), *TINY_OVERRIDES,
        ])
    # --analysis + --det-path is ambiguous (two different protocols):
    # refuse rather than silently run one of them
    with pytest.raises(SystemExit):
        main([
            "predict", "--data-root", str(data_root), "--analysis",
            "--det-path", str(tmp_path / "dets"),
            "--checkpoint", "final", *base,
        ])


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


@pytest.fixture(scope="module")
def pascal3d_release(tmp_path_factory):
    from multi_modal_regression_tpu.tools.synthetic import (
        generate_pascal3d_release,
    )

    root = tmp_path_factory.mktemp("cli_p3d")
    db, voc = generate_pascal3d_release(
        root / "release", classes=("aeroplane", "bicycle", "boat")
    )
    out = root / "prepared"
    rc = main([
        "prepare-data", "--dataset", "pascal3d",
        "--db-path", str(db), "--voc-dir", str(voc), "--out", str(out),
        "--classes", "aeroplane,bicycle,boat", "--workers", "2",
    ])
    assert rc == 0
    return db, voc, out


def test_prepare_data_pascal3d_then_train_mat_protocol(
    pascal3d_release, dictionary_file, tmp_path
):
    """The ingested release trains via the CLI, validating on the
    Pascal3dAll .mat protocol (--test-protocol mat)."""
    db, voc, out = pascal3d_release
    rc = main([
        "train", "--preset", "geodesic_bd",
        "--data-root", str(out),
        "--real-subdir", "train", "--train-data", "real",
        "--dbinfo", str(out / "dbinfo.mat"),
        "--test-protocol", "mat", "--mat-split", "val",
        "--dictionary", str(dictionary_file), "--dict-size", "4",
        "--workdir", str(tmp_path / "p3d_run"),
        *TINY_OVERRIDES,
    ])
    assert rc == 0
    assert (tmp_path / "p3d_run" / "checkpoints" / "final").exists()
    # predict on the mat protocol with and without the packed cache:
    # bit-equal batches -> identical result arrays (round-4.5: predict
    # gained the mat protocol + packed cache via _make_test_loader)
    import numpy as np

    base = [
        "predict", "--preset", "geodesic_bd",
        "--data-root", str(out),
        "--dbinfo", str(out / "dbinfo.mat"),
        "--test-protocol", "mat", "--mat-split", "val",
        "--dictionary", str(dictionary_file), "--dict-size", "4",
        "--workdir", str(tmp_path / "p3d_run"),
        *TINY_OVERRIDES,
    ]
    assert main([*base, "--save-str", "plainmat"]) == 0
    assert main([
        *base, "--save-str", "packedmat", "--packed-cache", "auto",
    ]) == 0
    a = np.load(tmp_path / "p3d_run" / "results_plainmat.npz")
    b = np.load(tmp_path / "p3d_run" / "results_packedmat.npz")
    assert set(a.files) == set(b.files)
    for k in a.files:
        np.testing.assert_array_equal(a[k], b[k], err_msg=k)


def test_prepare_data_objectnet3d_cli(tmp_path):
    from multi_modal_regression_tpu.tools.synthetic import (
        generate_objectnet3d_release,
    )

    db = generate_objectnet3d_release(tmp_path / "release")
    out = tmp_path / "prepared"
    rc = main([
        "prepare-data", "--dataset", "objectnet3d",
        "--db-path", str(db), "--out", str(out), "--workers", "2",
    ])
    assert rc == 0
    assert (out / "dbinfo.mat").exists()
    assert list((out / "train" / "bed").glob("*.png"))


def test_evaluate_detections_cli(pascal3d_release, tmp_path):
    """prepare-detections + evaluate-detections: the CLI table matches
    evaluate_detection_results called directly."""
    import numpy as np
    import scipy.io as spio

    from multi_modal_regression_tpu.detection import (
        DetectionSetIndex,
        build_voc_ground_truth,
        evaluate_detection_results,
        load_results_mat,
        save_results_mat,
    )
    from multi_modal_regression_tpu.tools.ingest import (
        load_annotations_for_images,
        read_image_set,
    )

    db, voc, _ = pascal3d_release
    classes = ("aeroplane", "bicycle", "boat")
    image_names = read_image_set(voc / "ImageSets" / "Main" / "val.txt")

    # detector txt files: one detection per image right on the GT boxes of
    # class 0 (plus one off-GT false positive)
    rows = []
    for i, n in enumerate(image_names):
        anns = load_annotations_for_images(
            db / "Annotations" / "aeroplane_pascal", [n]
        )[0]
        if anns:
            b = anns[0].bbox
            rows.append(f"{n} {b[0]} {b[1]} {b[2]} {b[3]} 0.9")
    rows.append(f"{image_names[0]} 0 0 5 5 0.1")
    (tmp_path / "results_aeroplane.txt").write_text("\n".join(rows) + "\n")

    det_out = tmp_path / "mr_dets"
    rc = main([
        "prepare-detections", "--detector", "maskrcnn",
        "--det-source", str(tmp_path),
        "--images-dir", str(voc / "JPEGImages"),
        "--image-set", str(voc / "ImageSets" / "Main" / "val.txt"),
        "--out", str(det_out), "--image-size", "32", "--workers", "2",
        "--detector-classes", "aeroplane",
    ])
    assert rc == 0
    index = DetectionSetIndex(str(det_out))
    assert len(index) == len(image_names)

    # synthetic predictions: the GT pose for every detection (ARP-perfect)
    rng = np.random.default_rng(0)
    bboxes, ypred, labels = [], [], []
    gt_by_cls = build_voc_ground_truth(
        db / "Annotations", index.image_names, classes
    )
    from multi_modal_regression_tpu.detection import ground_truth_per_class

    gts0 = ground_truth_per_class(gt_by_cls["aeroplane"], "aeroplane", 0)
    for i, name in enumerate(index.image_names):
        sample = index.load_image(i)
        if sample is None:
            bboxes.append(np.array([]))
            ypred.append(np.array([]))
            labels.append(np.array([]))
            continue
        n = len(sample["labels"])
        poses = np.zeros((n, 3))
        for j in range(n):
            g = gts0[i]
            if g is not None and len(g.poses):
                poses[j] = g.poses[0]
            else:
                poses[j] = rng.standard_normal(3)
        bboxes.append(sample["bboxes"])
        ypred.append(poses)
        labels.append(sample["labels"])  # 0-based
    results = tmp_path / "results.mat"
    save_results_mat(results, bboxes, ypred, labels)

    out_json = tmp_path / "table.json"
    # classes via a dbinfo file
    spio.savemat(
        str(tmp_path / "dbinfo_classes.mat"), {"classes": np.array(classes)}
    )
    rc = main([
        "evaluate-detections",
        "--results", str(results), "--det-path", str(det_out),
        "--annotations", str(db / "Annotations"),
        "--dbinfo", str(tmp_path / "dbinfo_classes.mat"),
        "--out", str(out_json),
    ])
    assert rc == 0
    table = json.loads(out_json.read_text())
    assert "aeroplane" in table and "mean" in table
    # matched detections carry the exact GT pose -> high ARP for class 0
    assert table["aeroplane"]["ap"] > 0.5
    assert table["aeroplane"]["arp"] > 0.5
    assert table["aeroplane"]["med_err_deg"] < 1e-3

    # parity with the library call
    b2, y2, l2, s2 = load_results_mat(results)
    direct = evaluate_detection_results(
        gt_by_cls, b2, y2, l2, classes, scores=s2, nbins=4
    )
    for cls in table:
        for k, v in table[cls].items():
            assert direct[cls][k] == pytest.approx(v, abs=1e-9, nan_ok=True)


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


def test_every_registered_config_flag_is_forwarded():
    """Guard for the dropped-flag bug class (round-3 review: verify-parity
    silently ignored --optimizer-dtype): every flag _add_config_overrides
    registers that names an ExperimentConfig field must be in
    _OVERRIDE_FIELDS, so every subcommand forwards it."""
    import argparse
    import dataclasses

    from multi_modal_regression_tpu.cli import (
        _OVERRIDE_FIELDS,
        _add_config_overrides,
    )
    from multi_modal_regression_tpu.train.presets import ExperimentConfig

    p = argparse.ArgumentParser()
    _add_config_overrides(p)
    ns = p.parse_args([])
    cfg_fields = {f.name for f in dataclasses.fields(ExperimentConfig)}
    registered = set(vars(ns)) & cfg_fields
    missing = registered - set(_OVERRIDE_FIELDS)
    assert not missing, (
        f"flags registered but not forwarded to get_config: {sorted(missing)}"
    )
    # and the forward list only names real config fields
    assert set(_OVERRIDE_FIELDS) <= cfg_fields


def test_pack_subcommand_prebuilds_the_train_caches(data_root):
    """`cli pack` builds exactly the caches a train run with the same
    flags would use (the multi-host pre-launch recipe), and is
    idempotent."""
    rc = main([
        "pack", "--preset", "simple_bd",
        "--data-root", str(data_root),
        *TINY_OVERRIDES,
    ])
    assert rc == 0
    cache = data_root / ".packed"
    assert (cache / "augmented2_32px" / "meta.json").exists()
    assert (cache / "test_32px" / "meta.json").exists()
    mtimes = {p: p.stat().st_mtime_ns for p in cache.rglob("*.npy")}
    rc = main([
        "pack", "--preset", "simple_bd",
        "--data-root", str(data_root),
        *TINY_OVERRIDES,
    ])
    assert rc == 0
    assert mtimes == {p: p.stat().st_mtime_ns for p in cache.rglob("*.npy")}


def test_train_packed_cache(data_root, dictionary_file, tmp_path):
    """--packed-cache auto: packs the crop trees on first use, trains from
    the memmap gathers (data/packed.py), and reuses the cache on rerun."""
    rc = main([
        "train", "--preset", "simple_bd",
        "--data-root", str(data_root),
        "--dictionary", str(dictionary_file),
        "--dict-size", "4",
        "--workdir", str(tmp_path / "packed_run"),
        "--packed-cache", "auto",
        *TINY_OVERRIDES,
    ])
    assert rc == 0
    cache = data_root / ".packed"
    assert (cache / "augmented2_32px" / "meta.json").exists()
    assert (cache / "test_32px" / "meta.json").exists()
    # rerun reuses the cache (no repack: npy mtimes unchanged)
    mtimes = {p: p.stat().st_mtime_ns for p in cache.rglob("*.npy")}
    rc = main([
        "train", "--preset", "simple_bd",
        "--data-root", str(data_root),
        "--dictionary", str(dictionary_file),
        "--dict-size", "4",
        "--workdir", str(tmp_path / "packed_run2"),
        "--packed-cache", "auto",
        *TINY_OVERRIDES,
    ])
    assert rc == 0
    assert mtimes == {p: p.stat().st_mtime_ns for p in cache.rglob("*.npy")}
