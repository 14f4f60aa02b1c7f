"""PASCAL3D+/ObjectNet3D release ingestion: record readers, walkers,
detector parsers — end-to-end over synthesized mini releases, with the
produced trees consumed by the UNCHANGED data.index / data.loader classes."""

import numpy as np
import pytest
import scipy.io as spio

from multi_modal_regression_tpu.data import (
    ClassBalancedIndex,
    FlatTestIndex,
    MatCropIndex,
    parse_name,
)
from multi_modal_regression_tpu.data.loader import BalancedLoader, MatCropLoader, TestLoader
from multi_modal_regression_tpu.detection import DetectionSetIndex
from multi_modal_regression_tpu.tools.ingest import (
    image_id,
    load_annotations_for_images,
    load_cad_vertices,
    load_record_objects,
    parse_maskrcnn_results,
    parse_objectnet_detections,
    parse_r4cnn_detections,
    parse_vk_detections,
    pascal3d_splits,
    prepare_detection_set,
    prepare_objectnet3d,
    prepare_pascal3d,
    read_image_set,
    read_voc_image_set,
)
from multi_modal_regression_tpu.tools.synthetic import (
    generate_objectnet3d_release,
    generate_pascal3d_release,
)

CLASSES = ("aeroplane", "bicycle", "boat")


@pytest.fixture(scope="module")
def release(tmp_path_factory):
    root = tmp_path_factory.mktemp("p3d")
    db, voc = generate_pascal3d_release(root / "release", classes=CLASSES)
    out = root / "prepared"
    summary = prepare_pascal3d(db, voc, out, classes=CLASSES, log=lambda s: None)
    return db, voc, out, summary


def test_set_file_readers(release):
    db, voc, _, _ = release
    names = read_image_set(db / "Image_sets" / "aeroplane_imagenet_train.txt")
    assert len(names) == 3 and names[0].startswith("n")
    voc_names = read_voc_image_set(
        voc / "ImageSets" / "Main" / "aeroplane_train.txt"
    )
    # the -1 flagged row is excluded
    assert len(voc_names) == 3 and all("_9" not in n for n in voc_names)


def test_record_reader_filters(release):
    db, _, _, _ = release
    anno = db / "Annotations" / "aeroplane_imagenet"
    objs = load_record_objects(anno / "n02000_train0.mat")
    # fixture: usable + truncated + other-class object
    assert len(objs) == 3
    assert sum(o.usable and o.cls == "aeroplane" for o in objs) == 1
    assert any(o.truncated for o in objs)
    assert any(o.cls == "other" for o in objs)
    usable = next(o for o in objs if o.usable and o.cls == "aeroplane")
    assert usable.distance > 0 and usable.focal == 3000.0  # focal*viewport


def test_cad_loader(release):
    db, _, _, _ = release
    models = load_cad_vertices(db / "CAD" / "aeroplane.mat", "aeroplane")
    assert len(models) == 2
    assert models[0].shape == (60, 3) and models[1].shape == (60, 3)


def test_prepare_pascal3d_trees_load(release):
    """The walker's trees feed the existing loaders unchanged."""
    _, _, out, summary = release
    for cls in CLASSES:
        s = summary["classes"][cls]
        assert s["train_crops"] > 0 and s["test_crops"] > 0
        assert s["augmented_crops"] > 0 and s["original_images"] > 0

    # class-balanced train tree (flipped crops, info files present)
    idx = ClassBalancedIndex(str(out / "train"), "real", classes=CLASSES)
    assert all(n > 0 for n in idx.num_images)
    loader = BalancedLoader(idx, items_per_batch=2, image_size=32, num_workers=2)
    batch = next(iter(loader))
    assert batch["xdata"].shape == (2 * len(CLASSES), 32, 32, 3)

    # flipped pairs: each crop has a (-az, el, -ct) partner
    names = idx.list_image_names[0]
    parsed = [parse_name(n) for n in names]
    by_prefix = {}
    for p in parsed:
        by_prefix.setdefault(p.prefix, []).append(p)
    pair = next(v for v in by_prefix.values() if len(v) == 2)
    a, b = sorted(pair, key=lambda p: p.az)
    assert a.az == pytest.approx(-b.az, abs=1e-4)
    assert a.ct == pytest.approx(-b.ct, abs=1e-4)
    assert a.el == pytest.approx(b.el, abs=1e-4)

    # flat test tree
    tidx = FlatTestIndex(str(out / "test"), classes=CLASSES)
    assert len(tidx) > 0
    tl = TestLoader(tidx, batch_size=4, image_size=32, num_workers=2)
    tb = next(iter(tl))
    assert tb["euler"].shape == (4, 3)

    # augmented2 tree: >2 crops per object (the jitter grid), info readable
    aidx = ClassBalancedIndex(str(out / "augmented2"), "real", classes=CLASSES)
    assert all(a >= t for a, t in zip(aidx.num_images, idx.num_images))

    # original tree: Pascal3dAll protocol over .mat crops
    midx = MatCropIndex(str(out / "original"), "test", classes=CLASSES)
    assert len(midx) > 0
    ml = MatCropLoader(midx, batch_size=3, num_workers=2)
    got = 0
    for b in ml:
        assert b["xdata"].shape[1:] == (224, 224, 3)
        got += int(b["valid"].sum())
    assert got > 0
    vidx = MatCropIndex(str(out / "original"), "val", classes=CLASSES)
    assert len(vidx) > 0


def test_prepare_pascal3d_crop_pose_matches_record(release):
    """A written test-crop filename carries the record's viewpoint."""
    db, _, out, _ = release
    cls = "aeroplane"
    tidx = FlatTestIndex(str(out / "test"), classes=CLASSES)
    name = next(
        str(n) for n, l in zip(tidx.image_names, tidx.labels) if l == 0
    )
    p = parse_name(name)
    # find the source annotation by the underscore-free image id
    anno_dir = db / "Annotations" / f"{cls}_pascal"
    match = None
    for f in anno_dir.glob("*.mat"):
        if image_id(f.stem) in p.prefix:
            for o in load_record_objects(f):
                if o.cls == cls and o.usable and abs(o.az - p.az) < 1e-4:
                    match = o
    assert match is not None
    assert match.el == pytest.approx(p.el, abs=1e-4)
    assert match.ct == pytest.approx(p.ct, abs=1e-4)
    assert match.distance == pytest.approx(p.d, abs=1e-4)


def test_gray_image_and_missing_annotation_skipped(release):
    db, _, out, _ = release
    # the gray imagenet-val image and the missing-annotation train image
    # produced no crops: their ids appear nowhere in the train tree
    idx = ClassBalancedIndex(str(out / "train"), "real", classes=CLASSES)
    all_names = " ".join(" ".join(map(str, n)) for n in idx.list_image_names)
    gray_id = image_id("n02000_val2")  # last val image is gray
    missing_id = image_id("n02000_train2")  # train2 has no annotation file
    assert gray_id not in all_names
    assert missing_id not in all_names


def test_dbinfo_and_splits(release):
    db, voc, out, _ = release
    tmp = spio.loadmat(str(out / "dbinfo.mat"), squeeze_me=True)
    # char arrays round-trip space-padded; consumers strip (cli.py:114)
    assert [str(c).strip() for c in tmp["classes"]] == list(CLASSES)
    splits = pascal3d_splits(db, voc, "bicycle")
    assert set(splits) == {
        "imagenet_train", "imagenet_val", "pascal_train", "pascal_val"
    }
    assert all(len(v) == 3 for v in splits.values())


def test_annotations_for_images(release):
    db, _, _, _ = release
    anno = db / "Annotations" / "aeroplane_pascal"
    names = [f.stem for f in sorted(anno.glob("*.mat"))] + ["nonexistent"]
    anns = load_annotations_for_images(anno, names)
    assert anns[-1] is None
    assert all(a is not None for a in anns[:-1])
    assert any(o.difficult for a in anns[:-1] for o in a)


def test_prepare_objectnet3d(tmp_path):
    classes = ("bed", "coffee_maker", "shoe")
    db = generate_objectnet3d_release(tmp_path / "release", classes=classes)
    out = tmp_path / "prepared"
    summary = prepare_objectnet3d(db, out, log=lambda s: None)
    assert set(summary) == set(classes)
    # dbinfo carries the class list the CLI's --dbinfo flag reads
    tmp = spio.loadmat(str(out / "dbinfo.mat"), squeeze_me=True)
    assert [str(c).strip() for c in tmp["classes"]] == list(classes)
    # train tree: 8 crops per object (flip x 4 rotations); ct steps of 90
    tr = FlatTestIndex(str(out / "train"), classes=classes)
    assert len(tr) == sum(s["train"] for s in summary.values())
    names0 = [
        str(n) for n, l in zip(tr.image_names, tr.labels) if l == 0
    ]
    prefixes = {}
    for n in names0:
        p = parse_name(n)
        prefixes.setdefault(p.prefix, []).append(p)
    group = max(prefixes.values(), key=len)
    assert len(group) == 8
    # 4 rotations of the original (az > 0) + 4 of the flip (az < 0, ct
    # negated); within each quadruple ct steps by 90 degrees
    for half in (
        [p for p in group if p.az >= 0], [p for p in group if p.az < 0]
    ):
        assert len(half) == 4
        cts = sorted(p.ct for p in half)
        assert np.allclose(np.diff(cts), 90.0, atol=1e-4)
    # underscore-free class id in filenames, raw class name as directory
    assert (out / "train" / "coffee_maker").exists()
    cm = FlatTestIndex(str(out / "train"), classes=classes)
    cm_names = [
        str(n) for n, l in zip(cm.image_names, cm.labels) if l == 1
    ]
    assert all(n.startswith("coffeemaker_") for n in cm_names)
    # test tree: single plain crop per object, loadable
    te = FlatTestIndex(str(out / "test"), classes=classes)
    assert len(te) > 0
    tl = TestLoader(te, batch_size=4, image_size=32, num_workers=2)
    assert next(iter(tl))["xdata"].shape == (4, 32, 32, 3)


def _vk_fixture(tmp_path, rng, image_names):
    """VOC2012_val_det.mat: 20-class chosenboxes/topscores cells."""
    n = len(image_names)
    chosen = np.empty((1, 20), object)
    tops = np.empty((1, 20), object)
    for c in range(20):
        boxes = np.empty((1, n), object)
        scores = np.empty((1, n), object)
        for i in range(n):
            k = int(rng.integers(0, 3)) if c in (0, 3) else 0
            boxes[0, i] = rng.uniform(0, 60, (k, 4)) + [0, 0, 30, 30]
            scores[0, i] = rng.uniform(0, 1, (k, 1))
        chosen[0, c] = boxes
        tops[0, c] = scores
    f = tmp_path / "VOC2012_val_det.mat"
    spio.savemat(str(f), {"chosenboxes": chosen, "topscores": tops})
    return f


def test_parse_vk_detections(tmp_path):
    rng = np.random.default_rng(0)
    names = [f"2008_{i:06d}" for i in range(4)]
    f = _vk_fixture(tmp_path, rng, names)
    dets = parse_vk_detections(f, num_images=4)
    assert len(dets) == 4
    boxes, labels = dets[0]
    assert boxes.shape[1] == 5  # score column appended
    # VOC ids 1 and 4 map to rigid classes 1 ('aeroplane') and 2 ('bottle'?
    # no: classInds[1]=2 is 'bicycle'; id 4 is position 3 -> 'bottle')
    assert set(np.unique(labels)) <= {1, 3}


def test_parse_r4cnn_detections(tmp_path):
    rng = np.random.default_rng(1)
    classes = ("aeroplane", "bicycle")
    for cls in classes:
        cell = np.empty((1, 3), object)
        for i in range(3):
            k = int(rng.integers(0, 3))
            cell[0, i] = rng.uniform(0, 50, (k, 5))
        spio.savemat(
            str(tmp_path / f"{cls}_pruned_boxes_voc_2012_val_bbox_reg.mat"),
            {"boxes": cell},
        )
    dets = parse_r4cnn_detections(tmp_path, classes=classes, num_images=3)
    assert len(dets) == 3
    for boxes, labels in dets:
        assert boxes.shape[1] == 5 and len(boxes) == len(labels)
        assert set(np.unique(labels)) <= {1, 2}


def test_parse_maskrcnn_and_prepare_detection_set(tmp_path, release):
    db, voc, _, _ = release
    img_dir = voc / "JPEGImages"
    image_names = read_image_set(voc / "ImageSets" / "Main" / "val.txt")[:4]
    rows = []
    for i, n in enumerate(image_names[:3]):
        rows.append(f"{n} 5 5 40 40 0.{9 - i}")
    (tmp_path / "results_aeroplane.txt").write_text("\n".join(rows) + "\n")
    dets = parse_maskrcnn_results(
        tmp_path, image_names, classes=("aeroplane",)
    )
    assert sum(len(b) for b, _ in dets) == 3
    assert dets[0][0][0, 4] == pytest.approx(0.9)

    out = tmp_path / "mr_dets"
    prepare_detection_set(img_dir, image_names, dets, out, size=64)
    idx = DetectionSetIndex(str(out))
    assert len(idx) == 4
    sample = idx.load_image(0)
    assert sample is not None
    assert sample["xdata"].shape[1:] == (64, 64, 3)
    assert sample["scores"][0] == pytest.approx(0.9)
    assert idx.load_image(3) is None  # no detections on the last image


def test_parse_objectnet_detections(tmp_path):
    lines = [
        "o3dval_00000 1 2 30 40 0.8 0.1 0.2 0.3",
        "o3dval_00001 5 6 50 60 0.7 -0.1 0.0 0.4",
    ]
    f = tmp_path / "detections_bed.txt"
    f.write_text("\n".join(lines) + "\n")
    info = parse_objectnet_detections(f)
    assert list(info["image_names"]) == ["o3dval_00000", "o3dval_00001"]
    assert info["bboxes"].shape == (2, 4)
    np.testing.assert_allclose(info["det_scores"], [0.8, 0.7])
    np.testing.assert_allclose(info["ypred"][0], [0.1, 0.2, 0.3])


def test_prepare_objectnet_detected_driver(tmp_path):
    """The setupDataDetected_objectnet3d.m driver end-to-end on a synthetic
    fixture: detinfo.mat + per-class crop trees (reference parity) AND the
    dbinfo/all detection-set layout `predict --det-path` consumes."""
    from PIL import Image

    from multi_modal_regression_tpu.tools.ingest import (
        prepare_objectnet_detected,
    )

    rng = np.random.default_rng(0)
    img_dir = tmp_path / "Images"
    img_dir.mkdir()
    # one big image (crop must downscale) and one small
    for name, hw in (("o3d_000", (300, 400)), ("o3d_001", (80, 90))):
        Image.fromarray(
            rng.integers(0, 256, (*hw, 3), np.uint8)
        ).save(img_dir / f"{name}.JPEG")
    det_dir = tmp_path / "dets"
    det_dir.mkdir()
    (det_dir / "detections_bed.txt").write_text(
        "o3d_000 10 10 350 280 0.9 0.1 0.2 0.3\n"
        "o3d_001 5 5 40 50 0.8 0.0 -0.1 0.2\n"
    )
    (det_dir / "detections_chair.txt").write_text(
        "o3d_000 20 30 200 150 0.7 0.3 0.0 0.1\n"
    )
    out = tmp_path / "detected"
    n = prepare_objectnet_detected(
        det_dir, img_dir, out, classes=("bed", "chair"), size=64,
    )
    assert n == 3
    # reference-parity outputs: <cls>_detinfo.mat + crop trees (:33-40)
    info = spio.loadmat(str(out / "bed_detinfo.mat"), squeeze_me=True)
    assert list(info["image_names"]) == ["o3d_000", "o3d_001"]
    np.testing.assert_allclose(info["det_scores"], [0.9, 0.8])
    assert info["ypred"].shape == (2, 3)
    crops = sorted((out / "bed").glob("*.png"))
    assert [c.name for c in crops] == ["bed_00000001.png", "bed_00000002.png"]
    with Image.open(crops[0]) as im:  # 341x271 box downscaled to max 64
        assert max(im.size) == 64
    with Image.open(crops[1]) as im:  # small box: no upscaling
        assert max(im.size) < 64
    # detection-set layout for `predict --det-path`
    idx = DetectionSetIndex(str(out))
    assert len(idx) == 2
    s0 = idx.load_image(0)
    assert s0["xdata"].shape == (2, 64, 64, 3)  # bed + chair on o3d_000
    # stored 1-based (reference convention); load_image returns 0-based
    assert sorted(s0["labels"].tolist()) == [0, 1]
    assert 0.7 in s0["scores"] and 0.9 in s0["scores"]


def test_prepare_detections_cli_objectnet(tmp_path):
    """`cli prepare-detections --detector objectnet` writes a set that the
    detected-bbox inference runner consumes (predict --det-path parity)."""
    from PIL import Image

    from multi_modal_regression_tpu.cli import main as cli_main
    from multi_modal_regression_tpu.detection import (
        DetectionSetIndex,
        run_detection_inference,
    )

    rng = np.random.default_rng(1)
    img_dir = tmp_path / "Images"
    img_dir.mkdir()
    for i in range(2):
        Image.fromarray(
            rng.integers(0, 256, (100, 120, 3), np.uint8)
        ).save(img_dir / f"im{i}.JPEG")
    det_dir = tmp_path / "dets"
    det_dir.mkdir()
    (det_dir / "detections_aeroplane.txt").write_text(
        "im0 5 5 80 90 0.9 0.1 0.2 0.3\nim1 10 10 60 70 0.6 0.0 0.1 0.2\n"
    )
    out = tmp_path / "o3d_dets"
    rc = cli_main([
        "prepare-detections", "--detector", "objectnet",
        "--det-source", str(det_dir), "--images-dir", str(img_dir),
        "--out", str(out), "--image-size", "32",
    ])
    assert rc == 0
    idx = DetectionSetIndex(str(out))
    assert len(idx) == 2

    from multi_modal_regression_tpu.dictionary.kmeans import KMeansDictionary
    from multi_modal_regression_tpu.train import Trainer, get_config

    centers = (0.7 * rng.standard_normal((4, 3))).astype(np.float32)
    cfg = get_config(
        "geodesic_bd", feature_network="resnet18", num_classes=12,
        N0=512, N1=16, N2=8, dict_size=4, image_size=32, eval_batch=4,
    )
    trainer = Trainer(cfg, dictionary=KMeansDictionary(cluster_centers=centers))
    state = trainer.init_state(0)
    bboxes, ypred, labels, scores = run_detection_inference(
        trainer.apply_fn, trainer.problem, state, idx, batch_size=4
    )
    assert len(bboxes) == 2
    assert ypred[0].shape == (1, 3) and np.isfinite(ypred[0]).all()
    np.testing.assert_allclose(scores[0], [0.9])


def test_mat_crop_loader_resizes_to_image_size(release):
    """The mat protocol evaluates at the EXPERIMENT's resolution: stored
    224^2 crops are host-resized when image_size differs (the round-2
    silent-resolution-mismatch fix)."""
    _, _, out, _ = release
    midx = MatCropIndex(str(out / "original"), "test", classes=CLASSES)
    ml = MatCropLoader(midx, batch_size=3, image_size=64, num_workers=2)
    b = next(iter(ml))
    assert b["xdata"].shape[1:] == (64, 64, 3)
    assert b["ydata"].shape[1] == 3
    # image_size matching the stored crops passes them through untouched
    ml224 = MatCropLoader(midx, batch_size=3, image_size=224, num_workers=2)
    b224 = next(iter(ml224))
    assert b224["xdata"].shape[1:] == (224, 224, 3)


def test_packed_mat_crop_loader_matches_plain(release, tmp_path):
    """PackedMatCropLoader == MatCropLoader bit-for-bit (same file order,
    buffering, padding; crops from the memmap instead of per-epoch
    loadmat+resize), and the pack is reused on a second call."""
    from multi_modal_regression_tpu.data import (
        PackedMatCropLoader,
        pack_mat_index,
    )

    _, _, out, _ = release
    midx = MatCropIndex(str(out / "original"), "test", classes=CLASSES)
    cache = tmp_path / "matpack"
    pack = pack_mat_index(midx, cache, image_size=64, num_workers=2)
    plain = list(MatCropLoader(midx, batch_size=3, image_size=64,
                               num_workers=2))
    packed = list(PackedMatCropLoader(midx, pack, batch_size=3))
    assert len(packed) == len(plain) and len(packed) > 0
    for bp, bq in zip(packed, plain, strict=True):
        assert set(bp) == set(bq)
        for k in bp:
            np.testing.assert_array_equal(bp[k], bq[k], err_msg=k)
    mtimes = {p.name: p.stat().st_mtime_ns for p in cache.glob("*.npy")}
    pack_mat_index(midx, cache, image_size=64, num_workers=2)  # reuses
    assert mtimes == {
        p.name: p.stat().st_mtime_ns for p in cache.glob("*.npy")
    }
    # a different size is a different cache state -> repack
    pack224 = pack_mat_index(midx, cache, image_size=224, num_workers=2)
    assert pack224.image_size == 224
    assert pack224.crops(CLASSES[0]).shape[1:] == (224, 224, 3)
    # a pre-format-marker cache (old layout: global crops.npy, 2-wide
    # file_rows) must REPACK on adoption, not crash mid-epoch
    import json as _json

    meta = _json.loads((cache / "meta.json").read_text())
    meta.pop("format")
    meta["file_rows"] = [r[1:] for r in meta["file_rows"]]  # old 2-wide
    (cache / "meta.json").write_text(_json.dumps(meta))
    pack_v2 = pack_mat_index(midx, cache, image_size=224, num_workers=2)
    assert pack_v2.meta["format"] == 2
    b = next(iter(PackedMatCropLoader(midx, pack_v2, batch_size=3)))
    assert b["xdata"].shape[1:] == (224, 224, 3)


def test_gather_tree_poses_tilt_sign_convention(tmp_path):
    """Dictionary poses must carry the db tilt sign the loaders train with
    (real +ct, render -ct — dataGenerators.py:57-62)."""
    from multi_modal_regression_tpu.data.naming import make_name
    from multi_modal_regression_tpu.tools.parity import gather_tree_poses
    from PIL import Image as PILImage

    cls_dir = tmp_path / "aeroplane"
    cls_dir.mkdir(parents=True)
    name = make_name("aeroplane_x1object1", 30.0, 10.0, 20.0, 4.0)
    PILImage.fromarray(
        np.zeros((8, 8, 3), np.uint8)
    ).save(cls_dir / f"{name}.png")
    y_real = gather_tree_poses(tmp_path, "real", classes=("aeroplane",))
    y_render = gather_tree_poses(tmp_path, "render", classes=("aeroplane",))
    from multi_modal_regression_tpu.data.targets import euler_to_pose
    import jax.numpy as jnp

    want_real = np.asarray(
        euler_to_pose(jnp.asarray([[30.0, 10.0, 20.0]], jnp.float32))
    )
    want_render = np.asarray(
        euler_to_pose(jnp.asarray([[30.0, 10.0, -20.0]], jnp.float32))
    )
    np.testing.assert_allclose(y_real, want_real, atol=1e-5)
    np.testing.assert_allclose(y_render, want_render, atol=1e-5)
    assert not np.allclose(y_real, y_render, atol=1e-3)
