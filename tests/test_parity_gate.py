"""The one-command quality-parity gate, end-to-end on the synthesized mini
PASCAL3D+ release: ingest -> dictionary -> train -> snapshot ensemble ->
AVP/ARP, all through `cli verify-parity` (tools/parity.py). The real-data
invocation is the same command with the release + torchvision weights
(BASELINE.md round 3 records it)."""

import json

import numpy as np
import pytest

from multi_modal_regression_tpu.cli import main
from multi_modal_regression_tpu.tools.synthetic import generate_pascal3d_release

CLASSES = ("aeroplane", "bicycle", "boat")


@pytest.fixture(scope="module")
def release(tmp_path_factory):
    root = tmp_path_factory.mktemp("parity_release")
    db, voc = generate_pascal3d_release(root / "release", classes=CLASSES)
    return root, db, voc


@pytest.fixture(scope="module")
def det_set(release, tmp_path_factory):
    """A tiny detection set over the release's VOC val images: GT boxes of
    each class as 'detections' (the maskrcnn txt protocol)."""
    root, db, voc = release
    from multi_modal_regression_tpu.tools.ingest import (
        load_annotations_for_images,
        read_image_set,
    )

    det_src = tmp_path_factory.mktemp("parity_dets")
    image_names = read_image_set(voc / "ImageSets" / "Main" / "val.txt")
    for cls in CLASSES:
        rows = []
        for n in image_names:
            anns = load_annotations_for_images(
                db / "Annotations" / f"{cls}_pascal", [n]
            )[0]
            for a in anns or ():
                b = a.bbox
                rows.append(f"{n} {b[0]} {b[1]} {b[2]} {b[3]} 0.9")
        (det_src / f"results_{cls}.txt").write_text("\n".join(rows) + "\n")
    out = det_src / "det_set"
    rc = main([
        "prepare-detections", "--detector", "maskrcnn",
        "--det-source", str(det_src),
        "--images-dir", str(voc / "JPEGImages"),
        "--image-set", str(voc / "ImageSets" / "Main" / "val.txt"),
        "--out", str(out), "--image-size", "32", "--workers", "2",
        "--detector-classes", ",".join(CLASSES),
    ])
    assert rc == 0
    return out


def test_verify_parity_gate_end_to_end(release, det_set, tmp_path):
    root, db, voc = release
    workdir = tmp_path / "gate"
    rc = main([
        "verify-parity",
        "--data-root", str(tmp_path / "prepared"),
        "--db-path", str(db), "--voc-dir", str(voc),
        "--det-path", str(det_set),
        "--annotations", str(db / "Annotations"),
        "--workdir", str(workdir),
        "--classes", ",".join(CLASSES),
        "--feature-network", "resnet18", "--N0", "512", "--N1", "16",
        "--N2", "8", "--dict-size", "4", "--image-size", "32",
        "--items-per-batch", "1", "--max-iterations", "2",
        "--num-epochs", "1", "--num-warmup-epochs", "1",
        "--eval-num-epochs", "1", "--num-workers", "2",
    ])
    assert rc == 0
    table = json.loads((workdir / "parity.json").read_text())
    stages = table["stages"]
    # every stage of the chain ran and produced its artifact/metrics
    assert set(stages) == {
        "prepare_data", "dictionary", "train", "evaluate", "detections"
    }
    assert np.isfinite(stages["train"]["med_err_deg"])
    ev = stages["evaluate"]
    assert np.isfinite(ev["ensembled_med_err_deg"])
    assert 0.0 <= ev["acc_pi_6_pct"] <= 100.0
    assert len(ev["snapshot_med_errs"]) >= 1
    assert set(ev["per_class"]) == set(CLASSES) | {"mean"}
    det = stages["detections"]
    assert set(det) == set(CLASSES) | {"mean"}
    for cls in CLASSES:
        assert 0.0 <= det[cls]["ap"] <= 1.0
    # scratch-trained fixture: the no-pretrained deviation must be flagged
    assert any("pretrained" in d for d in table["deviations"])
    # idempotent resume: a second invocation reuses every artifact —
    # including the fine-tune snapshots (num<k>.npz + done.json) and the
    # detection metrics (detections.json), the two post-train stages
    rc = main([
        "verify-parity",
        "--data-root", str(tmp_path / "prepared"),
        "--det-path", str(det_set),
        "--annotations", str(db / "Annotations"),
        "--workdir", str(workdir),
        "--classes", ",".join(CLASSES),
        "--feature-network", "resnet18", "--N0", "512", "--N1", "16",
        "--N2", "8", "--dict-size", "4", "--image-size", "32",
        "--items-per-batch", "1", "--max-iterations", "2",
        "--num-epochs", "1", "--num-warmup-epochs", "1",
        "--eval-num-epochs", "1", "--num-workers", "2",
    ])
    assert rc == 0
    table2 = json.loads((workdir / "parity.json").read_text())
    ev2 = table2["stages"]["evaluate"]
    # snapshots reloaded from disk -> identical ensemble and detections
    assert ev2["ensembled_med_err_deg"] == ev["ensembled_med_err_deg"]
    assert ev2["snapshot_med_errs"] == ev["snapshot_med_errs"]
    assert table2["stages"]["detections"] == det
