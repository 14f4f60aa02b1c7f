"""Detected-bbox inference pipeline + AVP/ARP metric glue."""

import numpy as np
import pytest

from multi_modal_regression_tpu.detection import (
    DetectionSetIndex,
    detections_per_class,
    run_detection_inference,
    save_results_mat,
)
from multi_modal_regression_tpu.dictionary.kmeans import KMeansDictionary
from multi_modal_regression_tpu.metrics.detection import (
    ImageGroundTruth,
    compute_detection_metrics,
)
from multi_modal_regression_tpu.tools.synthetic import generate_detection_set
from multi_modal_regression_tpu.train import Trainer, get_config

TINY = dict(
    feature_network="resnet18", feature_layer="layer4",
    num_classes=12, N0=512, N1=32, N2=16, dict_size=5, image_size=64,
)


@pytest.fixture(scope="module")
def det_root(tmp_path_factory):
    return generate_detection_set(
        tmp_path_factory.mktemp("dets") / "vk_dets",
        num_images=5, max_boxes=3, image_size=64, seed=7,
    )


def test_detection_index(det_root):
    idx = DetectionSetIndex(str(det_root))
    assert len(idx) == 5
    first = idx.load_image(0)
    assert first is not None
    assert first["xdata"].shape[1:] == (64, 64, 3)
    assert first["labels"].min() >= 0  # converted to 0-based
    # at least one empty image exists
    empties = [idx.load_image(i) is None for i in range(len(idx))]
    assert any(empties)


def test_run_detection_inference_and_save(det_root, tmp_path):
    rng = np.random.default_rng(0)
    centers = (0.7 * rng.standard_normal((5, 3))).astype(np.float32)
    cfg = get_config("geodesic_bd", **TINY)
    trainer = Trainer(cfg, dictionary=KMeansDictionary(cluster_centers=centers))
    state = trainer.init_state()
    idx = DetectionSetIndex(str(det_root))
    bboxes, ypred, labels, scores = run_detection_inference(
        trainer.apply_fn, trainer.problem, state, idx, batch_size=4
    )
    assert len(bboxes) == len(ypred) == len(labels) == len(scores) == len(idx)
    for i in range(len(idx)):
        sample = idx.load_image(i)
        if sample is None:
            assert len(ypred[i]) == 0
        else:
            assert ypred[i].shape == (len(sample["labels"]), 3)
            np.testing.assert_array_equal(labels[i], sample["labels"])

    out = tmp_path / "results.mat"
    save_results_mat(out, bboxes, ypred, labels)
    import scipy.io as spio

    loaded = spio.loadmat(str(out), squeeze_me=True)
    assert "ypred" in loaded and "bbox" in loaded and "labels" in loaded


def test_detections_per_class_and_metrics(det_root):
    """Perfect predictions on GT boxes give AP = AVP = 1 for a class."""
    idx = DetectionSetIndex(str(det_root))
    rng = np.random.default_rng(3)
    # build fake results where predictions == GT poses
    bboxes, ypred, labels, gts = [], [], [], []
    target_cls = None
    for i in range(len(idx)):
        s = idx.load_image(i)
        if s is None:
            bboxes.append(np.array([]))
            ypred.append(np.array([]))
            labels.append(np.array([]))
            gts.append(None)
            continue
        poses = 0.5 * rng.standard_normal((len(s["labels"]), 3))
        bboxes.append(s["bboxes"])
        ypred.append(poses)
        labels.append(s["labels"])
        if target_cls is None and len(s["labels"]):
            target_cls = int(s["labels"][0])
        gts.append((s["bboxes"], poses, s["labels"]))

    dets = detections_per_class(bboxes, ypred, labels, None, target_cls)
    gt_objs = []
    for g in gts:
        if g is None:
            gt_objs.append(None)
            continue
        bb, poses, ll = g
        sel = ll == target_cls
        gt_objs.append(
            ImageGroundTruth(boxes=bb[sel], poses=poses[sel]) if sel.any() else None
        )
    m = compute_detection_metrics(gt_objs, dets, mode="arp")
    assert m.num_gt > 0
    assert m.ap == pytest.approx(1.0)
    assert m.avp == pytest.approx(1.0)
    assert m.med_err < 1e-3


def test_evaluate_detection_results_perfect():
    """Detections placed exactly on GT with the true poses -> AP=AVP=ARP=1."""
    from multi_modal_regression_tpu.detection import evaluate_detection_results
    from multi_modal_regression_tpu.geometry.so3 import log_so3, rotation_from_euler
    from multi_modal_regression_tpu.tools.pascal3d_prep import ObjectAnnotation
    import jax.numpy as jnp

    rng = np.random.default_rng(11)
    classes = ("car", "bus")
    annos, bboxes, ypred, labels = [], [], [], []
    for i in range(4):
        objs = []
        bb, yp, ll = [], [], []
        for ci, cls in enumerate(classes):
            az, el, ct = rng.uniform(5, 80, 3)
            x1, y1 = rng.uniform(0, 100, 2)
            box = np.array([x1, y1, x1 + 60, y1 + 40])
            objs.append(ObjectAnnotation(
                cls=cls, bbox=box, az=az, el=el, ct=ct, distance=5.0))
            pose = np.asarray(log_so3(rotation_from_euler(
                jnp.asarray(az, jnp.float32), jnp.asarray(el, jnp.float32),
                jnp.asarray(ct, jnp.float32))))
            bb.append(box); yp.append(pose); ll.append(ci)
        annos.append(objs)
        bboxes.append(np.stack(bb)); ypred.append(np.stack(yp))
        labels.append(np.asarray(ll))
    table = evaluate_detection_results(annos, bboxes, ypred, labels, classes)
    for cls in classes:
        assert table[cls]["ap"] == pytest.approx(1.0)
        assert table[cls]["arp"] == pytest.approx(1.0)
        assert table[cls]["avp"] == pytest.approx(1.0)
        assert table[cls]["med_err_deg"] < 0.1
    assert table["mean"]["ap"] == pytest.approx(1.0)


def test_detection_index_with_score_column(tmp_path):
    """(n, 5) [x1 y1 x2 y2 score] rows (setupDataDetection_maskrcnn.m:41)
    split into boxes + scores; raw rows preserved for results files."""
    import scipy.io as spio

    root = tmp_path / "d5"
    (root / "all").mkdir(parents=True)
    rng = np.random.default_rng(0)
    spio.savemat(str(root / "all" / "img0.mat"), {
        "xdata": rng.integers(0, 256, (2, 32, 32, 3), np.uint8),
        "bboxes": np.array([[1, 2, 30, 40, 0.9], [5, 6, 25, 35, 0.4]]),
        "labels": np.array([1, 2]),
    })
    spio.savemat(str(root / "dbinfo.mat"), {"image_names": np.array(["img0"])})
    idx = DetectionSetIndex(str(root))
    s = idx.load_image(0)
    assert s["bboxes"].shape == (2, 5)
    assert s["boxes"].shape == (2, 4)
    np.testing.assert_allclose(s["scores"], [0.9, 0.4])


def test_score_ranking_drives_pr_curve():
    """A low-score false positive must not hurt AP (it ranks last); with
    unit scores and FP-first file order it would."""
    gts = [ImageGroundTruth(boxes=np.array([[0, 0, 50, 50.0]]),
                            poses=np.zeros((1, 3)))]
    from multi_modal_regression_tpu.metrics.detection import ImageDetections

    dets = [ImageDetections(
        boxes=np.array([[200, 200, 240, 240.0], [0, 0, 50, 50.0]]),  # FP first
        scores=np.array([0.1, 0.9]),
        poses=np.zeros((2, 3)),
    )]
    m = compute_detection_metrics(gts, dets, mode="arp")
    assert m.ap == pytest.approx(1.0)  # TP ranks first by score
    dets_unit = [ImageDetections(
        boxes=dets[0].boxes, scores=np.ones(2), poses=dets[0].poses
    )]
    m2 = compute_detection_metrics(gts, dets_unit, mode="arp")
    assert m2.ap < 1.0  # stable file order puts the FP first


def test_unannotated_images_skip_detections():
    """GT None (no annotation file) skips detections entirely; an annotated
    image with zero objects counts them as FPs (computeAVP.m:42-43)."""
    from multi_modal_regression_tpu.metrics.detection import ImageDetections

    gt_obj = ImageGroundTruth(boxes=np.array([[0, 0, 50, 50.0]]),
                              poses=np.zeros((1, 3)))
    det_tp = ImageDetections(boxes=np.array([[0, 0, 50, 50.0]]),
                             scores=np.array([0.9]), poses=np.zeros((1, 3)))
    # FP outranks the TP so it depresses the precision envelope if counted
    det_fp = ImageDetections(boxes=np.array([[5, 5, 60, 60.0]]),
                             scores=np.array([0.95]), poses=np.zeros((1, 3)))
    # not annotated -> the FP is ignored
    m = compute_detection_metrics([gt_obj, None], [det_tp, det_fp], mode="arp")
    assert m.ap == pytest.approx(1.0)
    # annotated but empty -> the FP counts
    empty = ImageGroundTruth(boxes=np.zeros((0, 4)), poses=np.zeros((0, 3)))
    m2 = compute_detection_metrics([gt_obj, empty], [det_tp, det_fp], mode="arp")
    assert m2.ap < 1.0


def test_ground_truth_eval_filter_and_coarse_fallback():
    """Eval GT keeps non-difficult objects regardless of truncation and
    falls back to coarse angles when distance == 0 (computeARP.m:49-67)."""
    from multi_modal_regression_tpu.detection import ground_truth_per_class
    from multi_modal_regression_tpu.tools.pascal3d_prep import ObjectAnnotation

    objs = [
        ObjectAnnotation(cls="car", bbox=np.array([0, 0, 10, 10]),
                         az=30, el=10, ct=0, distance=4.0, truncated=True),
        ObjectAnnotation(cls="car", bbox=np.array([0, 0, 10, 10]),
                         az=0, el=0, ct=0, distance=0.0,
                         azimuth_coarse=90.0, elevation_coarse=5.0),
        ObjectAnnotation(cls="car", bbox=np.array([0, 0, 10, 10]),
                         az=50, el=0, ct=0, distance=4.0, difficult=True),
    ]
    gts = ground_truth_per_class([objs, None, []], "car", 0)
    assert gts[1] is None  # unannotated image
    assert len(gts[2].boxes) == 0  # annotated, no class objects
    g = gts[0]
    assert len(g.boxes) == 2  # truncated kept, difficult dropped
    np.testing.assert_allclose(g.azimuths, [30.0, 90.0])
