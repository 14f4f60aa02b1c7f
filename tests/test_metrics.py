"""Metric parity tests: pose errors and detection AP/AVP/ARP."""

import os
import sys

import numpy as np
import pytest

from multi_modal_regression_tpu.metrics import (
    geodesic_error_deg,
    quaternion_error_deg,
    pose_error_stats,
    mean_class_median_error,
    mean_class_accuracy,
    voc_ap,
    box_overlap,
    compute_detection_metrics,
)
from multi_modal_regression_tpu.metrics.detection import (
    ImageGroundTruth,
    ImageDetections,
    azimuth_from_axis_angle,
    azimuth_bin,
)
from tests.conftest import random_rotations

REFERENCE = "/root/reference"
HAS_REFERENCE = os.path.isdir(REFERENCE)


def random_axis_angles(rng, n):
    v = rng.standard_normal((n, 3))
    v /= np.linalg.norm(v, axis=1, keepdims=True)
    return v * rng.uniform(0.01, np.pi - 0.1, size=(n, 1))


class TestPoseErrors:
    def test_zero_error(self, rng):
        y = random_axis_angles(rng, 16)
        err = geodesic_error_deg(y, y)
        np.testing.assert_allclose(err, 0.0, atol=1e-2)

    def test_known_angle(self):
        y1 = np.array([[0.0, 0.0, 0.0]])
        y2 = np.array([[0.0, 0.0, np.pi / 6]])  # 30 deg about z
        np.testing.assert_allclose(geodesic_error_deg(y1, y2), [30.0], atol=1e-6)

    def test_conventions_agree(self, rng):
        y1, y2 = random_axis_angles(rng, 32), random_axis_angles(rng, 32)
        a = geodesic_error_deg(y1, y2, convention="reference")
        b = geodesic_error_deg(y1, y2, convention="matlab")
        np.testing.assert_allclose(a, b, atol=1e-3)

    def test_quaternion_double_cover(self, rng):
        q = rng.standard_normal((8, 4))
        q /= np.linalg.norm(q, axis=1, keepdims=True)
        np.testing.assert_allclose(quaternion_error_deg(q, -q), 0.0, atol=1e-2)

    def test_stats(self, rng):
        y1 = np.zeros((10, 3))
        # 5 samples at 10 degrees, 5 at 50 degrees about z
        y2 = np.zeros((10, 3))
        y2[:5, 2] = np.radians(10)
        y2[5:, 2] = np.radians(50)
        acc, med, err = pose_error_stats(y1, y2)
        assert acc == 50.0
        np.testing.assert_allclose(med, 30.0, atol=1e-6)

    def test_mean_class_median(self):
        y1 = np.zeros((4, 3))
        y2 = np.zeros((4, 3))
        y2[:2, 2] = np.radians(10)  # class 0 -> 10 deg
        y2[2:, 2] = np.radians(20)  # class 1 -> 20 deg
        labels = np.array([0, 0, 1, 1])
        got = mean_class_median_error(y1, y2, labels, 2)
        np.testing.assert_allclose(got, 15.0, atol=1e-6)

    def test_mean_class_accuracy(self):
        ytrue = np.array([0, 0, 1, 1])
        ypred = np.array([0, 1, 1, 1])
        np.testing.assert_allclose(mean_class_accuracy(ytrue, ypred, 2), 0.75)

    def test_analysis_report(self):
        """analysis_report computes the MATLAB-offline numbers from the
        joint-analysis dump: the oracle selection reads each sample's pose
        at its TRUE class, pred-cat at the predicted class."""
        from multi_modal_regression_tpu.train.analysis import analysis_report

        # 4 samples, 2 classes; per-class poses differ so the selection
        # channel is observable: class-0 heads are exact, class-1 heads
        # are 20 deg off about z
        ypose = np.zeros((4, 3, 2))
        ypose[:, 2, 1] = np.radians(20)
        result = {
            "ytrue_cat": np.array([0, 0, 1, 1]),
            "ypred_cat": np.array([0, 1, 1, 1]),  # sample 1 misclassified
            "ytrue_pose": np.zeros((4, 3)),
            "ypred_pose": ypose,
        }
        rep = analysis_report(result, 2)
        np.testing.assert_allclose(rep["cat_acc"], 0.75)
        # oracle: class 0 -> 0 deg, class 1 -> 20 deg; mean-class median 10
        np.testing.assert_allclose(rep["mederr_oracle"], 10.0, atol=1e-6)
        assert rep["acc30_oracle"] == 100.0
        # pred-cat: sample 1 decodes the class-1 head (20 deg) instead
        np.testing.assert_allclose(rep["mederr_predcat"], 15.0, atol=1e-6)
        assert rep["acc30_predcat"] == 100.0


class TestDetection:
    def test_box_overlap_identity(self):
        b = np.array([10, 10, 20, 20])
        np.testing.assert_allclose(box_overlap(b[None], b), [1.0])

    def test_box_overlap_disjoint(self):
        np.testing.assert_allclose(
            box_overlap(np.array([[0, 0, 5, 5]]), np.array([10, 10, 20, 20])), [0.0]
        )

    def test_voc_ap_perfect(self):
        recall = np.array([0.5, 1.0])
        precision = np.array([1.0, 1.0])
        np.testing.assert_allclose(voc_ap(recall, precision), 1.0)

    def test_azimuth_roundtrip(self):
        from multi_modal_regression_tpu.geometry import rotation_from_euler, log_so3
        import jax.numpy as jnp

        for az in [10.0, 95.0, 200.0, 340.0]:
            R = rotation_from_euler(jnp.float64(az), jnp.float64(20.0), jnp.float64(5.0))
            y = np.asarray(log_so3(R))
            got = azimuth_from_axis_angle(y)
            assert abs(got - az) < 0.1, (az, got)

    def test_azimuth_bin_edges(self):
        # 4 bins: edges at 0, 45, 135, 225, 315; >315 wraps to bin 0
        assert azimuth_bin(10.0, 4) == 0
        assert azimuth_bin(90.0, 4) == 1
        assert azimuth_bin(180.0, 4) == 2
        assert azimuth_bin(270.0, 4) == 3
        assert azimuth_bin(350.0, 4) == 0

    def test_arp_perfect_detections(self, rng):
        poses = random_axis_angles(rng, 3)
        gts, dets = [], []
        for i in range(3):
            box = np.array([[10.0 * i, 0.0, 10.0 * i + 8, 8.0]])
            gts.append(ImageGroundTruth(boxes=box, poses=poses[i : i + 1]))
            dets.append(
                ImageDetections(boxes=box.copy(), scores=np.array([0.9]), poses=poses[i : i + 1])
            )
        m = compute_detection_metrics(gts, dets, mode="arp")
        np.testing.assert_allclose(m.ap, 1.0)
        np.testing.assert_allclose(m.avp, 1.0)
        assert m.med_err < 1e-2
        assert m.num_gt == 3 and m.num_correct == 3

    def test_arp_wrong_pose_correct_box(self, rng):
        pose = np.array([[0.0, 0.0, 0.1]])
        wrong = np.array([[0.0, 0.0, 0.1 + np.radians(60)]])
        box = np.array([[0.0, 0.0, 8.0, 8.0]])
        gts = [ImageGroundTruth(boxes=box, poses=pose)]
        dets = [ImageDetections(boxes=box.copy(), scores=np.array([0.9]), poses=wrong)]
        m = compute_detection_metrics(gts, dets, mode="arp")
        np.testing.assert_allclose(m.ap, 1.0)
        np.testing.assert_allclose(m.avp, 0.0)

    def test_duplicate_detection_is_false_positive(self, rng):
        pose = random_axis_angles(rng, 1)
        box = np.array([[0.0, 0.0, 8.0, 8.0]])
        gts = [ImageGroundTruth(boxes=box, poses=pose)]
        # the duplicate outranks the matching detection: matching is greedy in
        # detection order within an image, ranking is global by score, so the
        # higher-scored duplicate becomes a false positive ranked first
        dets = [
            ImageDetections(
                boxes=np.concatenate([box, box]),
                scores=np.array([0.8, 0.9]),
                poses=np.concatenate([pose, pose]),
            )
        ]
        m = compute_detection_metrics(gts, dets, mode="arp")
        assert m.num_correct == 1
        np.testing.assert_allclose(m.ap, 0.5)


@pytest.mark.skipif(not HAS_REFERENCE, reason="reference repo not mounted")
class TestReferenceParity:
    @classmethod
    def setup_class(cls):
        sys.path.insert(0, REFERENCE)
        import axisAngle as aa
        import quaternion as qt
        import helperFunctions as hf

        cls.aa, cls.qt, cls.hf = aa, qt, hf

    @classmethod
    def teardown_class(cls):
        sys.path.remove(REFERENCE)

    def test_get_error2_parity(self, rng):
        y1 = random_axis_angles(rng, 60)
        y2 = y1 + 0.1 * rng.standard_normal((60, 3))
        labels = rng.integers(0, 4, 60)
        ours = mean_class_median_error(y1, y2, labels, 4)
        ref = self.aa.get_error2(y1, y2, labels, 4)
        np.testing.assert_allclose(ours, ref, rtol=1e-9)

    def test_get_error_parity(self, rng):
        y1 = random_axis_angles(rng, 40)
        y2 = y1 + 0.2 * rng.standard_normal((40, 3))
        acc, med, err = pose_error_stats(y1, y2)
        racc, rmed, rerr = self.aa.get_error(y1, y2)
        np.testing.assert_allclose(err, rerr, rtol=1e-9)
        np.testing.assert_allclose([acc, med], [racc, rmed], rtol=1e-9)

    def test_quaternion_error_parity(self, rng):
        q1 = rng.standard_normal((40, 4))
        q1 /= np.linalg.norm(q1, axis=1, keepdims=True)
        q2 = rng.standard_normal((40, 4))
        q2 /= np.linalg.norm(q2, axis=1, keepdims=True)
        _, _, err = pose_error_stats(q1, q2, representation="quaternion")
        _, _, rerr = self.qt.get_error(q1, q2)
        np.testing.assert_allclose(err, rerr, rtol=1e-9)

    def test_accuracy_parity(self, rng):
        yt = rng.integers(0, 5, 100)
        yp = rng.integers(0, 5, 100)
        np.testing.assert_allclose(
            mean_class_accuracy(yt, yp, 5), self.hf.get_accuracy(yt, yp, 5), rtol=1e-12
        )


def test_azimuth_bin_matches_matlab_find_interval():
    """Brute-force parity with computeAVP.m's find_interval (:168-178):
    strict `azimuth < edge` loop, index capped at the last edge, wrap of
    azimuths beyond the last edge to bin 0."""
    from multi_modal_regression_tpu.metrics.detection import azimuth_bin

    for nbins in (4, 8, 16, 24):
        half = 360.0 / (2 * nbins)
        edges = [0.0] + list(np.arange(half, 360.0 - half + 1e-9, 360.0 / nbins))

        def matlab_find_interval(az):
            i = len(edges)  # MATLAB loop leaves i at numel if never broken
            for k, e in enumerate(edges, start=1):
                if az < e:
                    i = k
                    break
            ind = i - 1  # 1-based ind
            if az > edges[-1]:
                ind = 1
            return ind - 1  # 0-based

        test_azimuths = (
            list(np.linspace(0, 359.99, 73))
            + edges  # exactly on every edge
            + [0.0, 359.999, edges[-1]]
        )
        for az in test_azimuths:
            assert azimuth_bin(float(az), nbins) == matlab_find_interval(float(az)), (
                nbins, az
            )


def test_mean_class_accuracy_skips_absent_classes():
    """Absent classes are skipped with a warning (0/0 would NaN the
    headline metric on synthetic/mini sets); present-class math unchanged."""
    import warnings

    from multi_modal_regression_tpu.metrics.pose_error import (
        mean_class_accuracy,
    )

    ytrue = np.array([0, 0, 1, 1])
    ypred = np.array([0, 1, 1, 1])
    with warnings.catch_warnings(record=True) as w:
        warnings.simplefilter("always")
        acc = mean_class_accuracy(ytrue, ypred, num_classes=3)
    assert any("absent" in str(x.message) for x in w)
    np.testing.assert_allclose(acc, (0.5 + 1.0) / 2)
    # all classes present: no warning, exact reference value
    with warnings.catch_warnings(record=True) as w:
        warnings.simplefilter("always")
        full = mean_class_accuracy(np.array([0, 1, 2]), np.array([0, 1, 0]), 3)
    assert not w
    np.testing.assert_allclose(full, 2.0 / 3.0)
