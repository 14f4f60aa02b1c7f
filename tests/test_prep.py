"""Data-preparation tools: camera model, homography, warping, crop writers."""

import numpy as np
import pytest
from PIL import Image

from multi_modal_regression_tpu.data import (
    ClassBalancedIndex,
    parse_name,
)
from multi_modal_regression_tpu.detection import DetectionSetIndex
from multi_modal_regression_tpu.tools.pascal3d_prep import (
    ObjectAnnotation,
    augmented_patches,
    camera_rotation,
    crop_patch,
    crop_patch_resized,
    fit_homography,
    project_vertices,
    visible_vertices,
    warp_image,
    write_detection_crops,
    write_flipped_crops,
    write_original_crops,
)


def test_camera_rotation_orthonormal():
    R = camera_rotation(30.0, 10.0, -5.0)
    np.testing.assert_allclose(R @ R.T, np.eye(3), atol=1e-12)
    np.testing.assert_allclose(np.linalg.det(R), 1.0, atol=1e-12)


def test_projection_depth_scaling():
    """Doubling distance halves the projected spread around the principal
    point (perspective division)."""
    rng = np.random.default_rng(0)
    P = 0.3 * rng.standard_normal((50, 3))
    x1, y1 = project_vertices(P, 20, 10, 0, 4.0, 3000, 100, 120)
    x2, y2 = project_vertices(P, 20, 10, 0, 8.0, 3000, 100, 120)
    r1 = np.hypot(x1 - 100, y1 - 120)
    r2 = np.hypot(x2 - 100, y2 - 120)
    np.testing.assert_allclose(np.median(r1 / np.maximum(r2, 1e-9)), 2.0, rtol=0.2)


def test_visible_vertices_quarter():
    rng = np.random.default_rng(1)
    P = rng.standard_normal((100, 3))
    vis = visible_vertices(P, 0, 0, 0, 5.0)
    assert 0.15 <= vis.mean() <= 0.35


def test_fit_homography_recovers_projective():
    rng = np.random.default_rng(2)
    H_true = np.array([[1.1, 0.05, 3.0], [-0.03, 0.95, -2.0], [1e-4, -2e-4, 1.0]])
    src = rng.uniform(0, 200, (20, 2))
    sh = np.concatenate([src, np.ones((20, 1))], axis=1) @ H_true.T
    dst = sh[:, :2] / sh[:, 2:3]
    H = fit_homography(src, dst)
    np.testing.assert_allclose(H, H_true, rtol=1e-6, atol=1e-8)


def test_warp_image_identity_and_translation():
    rng = np.random.default_rng(3)
    img = rng.integers(0, 255, (20, 30, 3), np.uint8)
    out, (x0, y0) = warp_image(img, np.eye(3))
    np.testing.assert_array_equal(out, img)
    assert (x0, y0) == (0.0, 0.0)
    T = np.array([[1, 0, 5.0], [0, 1, -3.0], [0, 0, 1]])
    out_t, (x0t, y0t) = warp_image(img, T)
    np.testing.assert_array_equal(out_t, img)  # pure shift, offset absorbs it
    assert (x0t, y0t) == (5.0, -3.0)


def test_crop_patch_downscale_only():
    img = np.zeros((500, 400, 3), np.uint8)
    patch = crop_patch(img, [10, 10, 409, 309])  # 400x300 -> scaled by 400/224
    assert max(patch.shape[:2]) <= 224
    small = crop_patch(img, [0, 0, 99, 49])  # 100x50 stays
    assert small.shape[:2] == (50, 100)
    exact = crop_patch_resized(img, [0, 0, 99, 49], 224)
    assert exact.shape == (224, 224, 3)


def _demo_objects(cls="car"):
    return [
        ObjectAnnotation(
            cls=cls, bbox=np.array([20, 30, 120, 110]),
            az=30.0, el=10.0, ct=-5.0, distance=4.0,
            focal=3000.0, px=80.0, py=60.0, cad_index=0,
        ),
        ObjectAnnotation(  # filtered: truncated
            cls=cls, bbox=np.array([0, 0, 50, 50]),
            az=0, el=0, ct=0, distance=4.0, truncated=True,
        ),
    ]


def test_write_flipped_crops_naming(tmp_path):
    rng = np.random.default_rng(4)
    img = rng.integers(0, 255, (160, 200, 3), np.uint8)
    names = write_flipped_crops(img, _demo_objects(), "2008_000001", tmp_path / "car", "car")
    assert len(names) == 2  # usable object + flip; truncated filtered
    p0, p1 = parse_name(names[0]), parse_name(names[1])
    assert (p0.az, p0.el, p0.ct) == (30.0, 10.0, -5.0)
    assert (p1.az, p1.el, p1.ct) == (-30.0, 10.0, 5.0)  # flip: (-az, el, -ct)
    for n in names:
        assert (tmp_path / "car" / f"{n}.png").exists()
    # the written tree is consumable by the training index
    idx = ClassBalancedIndex(str(tmp_path), "real", classes=("car",))
    assert len(idx) == 2


def test_write_original_crops(tmp_path):
    import scipy.io as spio

    rng = np.random.default_rng(5)
    img = rng.integers(0, 255, (160, 200, 3), np.uint8)
    files = write_original_crops(img, _demo_objects(), "2008_000002", tmp_path, "car")
    assert files == ["2008_000002.mat"]
    m = spio.loadmat(str(tmp_path / files[0]))
    assert m["xdata"].shape == (1, 224, 224, 3)
    assert m["ydata"].shape == (1, 3)
    # ydata is the axis-angle of R(az, el, ct)
    from scipy.spatial.transform import Rotation

    angle = np.linalg.norm(m["ydata"][0])
    assert 0 < angle < np.pi


def test_augmented_patches_pose_grid(tmp_path):
    rng = np.random.default_rng(6)
    img = rng.integers(0, 255, (160, 200, 3), np.uint8)
    # CAD proxy: a random point cloud around the origin
    vertices = 0.4 * rng.standard_normal((200, 3))
    obj = _demo_objects()[0]
    patches = augmented_patches(
        img, obj, vertices, az_range=(-1, 0, 1), el_range=(0,), ct_range=(0,)
    )
    assert len(patches) >= 2  # grid entries x 2 (flips)
    angles = {tuple(np.round(a, 3)) for _, a in patches}
    assert (30.0, 10.0, -5.0) in angles  # unperturbed entry present
    assert (-30.0, 10.0, 5.0) in angles  # and its flip
    for patch, _ in patches:
        assert patch.ndim == 3 and max(patch.shape[:2]) <= 224


def test_write_detection_crops_roundtrip(tmp_path):
    rng = np.random.default_rng(7)
    images = {
        "img0": rng.integers(0, 255, (100, 120, 3), np.uint8),
        "img1": rng.integers(0, 255, (90, 90, 3), np.uint8),
    }
    detections = {
        "img0": (np.array([[5, 5, 60, 70], [10, 10, 80, 80.0]]), np.array([1, 3])),
        # img1: no detections
    }
    write_detection_crops(images, detections, tmp_path / "dets", size=64)
    idx = DetectionSetIndex(str(tmp_path / "dets"))
    assert len(idx) == 2
    s0 = idx.load_image(0)
    assert s0["xdata"].shape == (2, 64, 64, 3)
    np.testing.assert_array_equal(s0["labels"], [0, 2])  # back to 0-based
    assert idx.load_image(1) is None


def test_write_info_mat_roundtrip(tmp_path):
    from multi_modal_regression_tpu.tools.pascal3d_prep import write_info_mat
    from multi_modal_regression_tpu.data.index import _class_image_names

    names = ["car_a1object1_a1.0_e2.0_t3.0_d4.0",
             "car_b2object1_a5.0_e6.0_t7.0_d8.0"]
    write_info_mat(tmp_path, "car", names, pascal_train=names[:1],
                   pascal_val=names[1:])
    got = _class_image_names(tmp_path, "car")
    assert list(got) == names
    got_train = _class_image_names(tmp_path, "car", info_key="pascal_train")
    assert list(got_train) == names[:1]
