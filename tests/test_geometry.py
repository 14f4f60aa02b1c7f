"""Geometry core tests: closed-form identities + golden parity vs the
reference numpy implementations (when /root/reference is mounted)."""

import os
import sys

import numpy as np
import pytest
import jax
import jax.numpy as jnp

from multi_modal_regression_tpu.geometry import (
    rotation_from_euler,
    exp_so3,
    log_so3,
    hat,
    geodesic_angle,
    geodesic_distance_aa,
    quat_from_rotation,
    quat_from_axis_angle,
    axis_angle_from_quat,
    quat_geodesic_angle,
    convert_dictionary,
)
from tests.conftest import random_rotations

REFERENCE = "/root/reference"
HAS_REFERENCE = os.path.isdir(REFERENCE)


def random_axis_angles(rng, n, max_angle=np.pi - 0.1):
    v = rng.standard_normal((n, 3))
    v = v / np.linalg.norm(v, axis=1, keepdims=True)
    theta = rng.uniform(0.01, max_angle, size=(n, 1))
    return (v * theta).astype(np.float64)


class TestSO3:
    def test_hat_cross_product(self, rng):
        v = rng.standard_normal((5, 3))
        x = rng.standard_normal((5, 3))
        got = np.einsum("nij,nj->ni", np.asarray(hat(jnp.asarray(v))), x)
        np.testing.assert_allclose(got, np.cross(v, x), atol=1e-6)

    def test_exp_log_roundtrip(self, rng):
        y = random_axis_angles(rng, 64)
        y2 = np.asarray(log_so3(exp_so3(jnp.asarray(y))))
        np.testing.assert_allclose(y2, y, atol=1e-5)

    def test_log_exp_roundtrip_rotations(self, rng):
        R = random_rotations(rng, 64)
        R2 = np.asarray(exp_so3(log_so3(jnp.asarray(R))))
        np.testing.assert_allclose(R2, R, atol=1e-5)

    def test_exp_identity_at_zero(self):
        R = np.asarray(exp_so3(jnp.zeros((2, 3))))
        np.testing.assert_allclose(R, np.broadcast_to(np.eye(3), (2, 3, 3)), atol=1e-7)

    def test_log_identity_is_zero(self):
        y = np.asarray(log_so3(jnp.broadcast_to(jnp.eye(3), (2, 3, 3))))
        np.testing.assert_allclose(y, 0.0, atol=1e-7)

    def test_exp_is_rotation(self, rng):
        y = random_axis_angles(rng, 32)
        R = np.asarray(exp_so3(jnp.asarray(y)))
        eye = np.broadcast_to(np.eye(3), R.shape)
        np.testing.assert_allclose(np.swapaxes(R, -2, -1) @ R, eye, atol=1e-6)
        np.testing.assert_allclose(np.linalg.det(R), 1.0, atol=1e-6)

    def test_geodesic_angle_self_zero(self, rng):
        R = random_rotations(rng, 8)
        theta = np.asarray(geodesic_angle(jnp.asarray(R), jnp.asarray(R)))
        np.testing.assert_allclose(theta, 0.0, atol=1e-3)

    def test_geodesic_known_angle(self):
        # rotate about Z by 90 degrees vs identity
        R1 = jnp.eye(3)[None]
        R2 = rotation_from_euler(jnp.array([90.0]), jnp.array([0.0]), jnp.array([0.0]))
        theta = np.asarray(geodesic_angle(R1, R2))
        np.testing.assert_allclose(theta, np.pi / 2, atol=1e-6)

    def test_euler_composition_order(self):
        # R(az, el, ct) = Rz(ct) Rx(el) Rz(az)
        az, el, ct = 30.0, 40.0, 50.0
        R = np.asarray(rotation_from_euler(jnp.array(az), jnp.array(el), jnp.array(ct)))
        Rz_only = np.asarray(rotation_from_euler(jnp.array(az), jnp.array(0.0), jnp.array(0.0)))
        Rx_only = np.asarray(rotation_from_euler(jnp.array(0.0), jnp.array(el), jnp.array(0.0)))
        Rc_only = np.asarray(rotation_from_euler(jnp.array(0.0), jnp.array(0.0), jnp.array(ct)))
        np.testing.assert_allclose(R, Rc_only @ Rx_only @ Rz_only, atol=1e-6)

    def test_gradients_finite_at_small_angles(self):
        def f(y):
            return jnp.sum(geodesic_distance_aa(y, y + 1e-3, eps=1e-6))

        g = jax.grad(f)(jnp.full((4, 3), 1e-8))
        assert np.all(np.isfinite(np.asarray(g)))

    def test_jit_vmap_compose(self, rng):
        y = jnp.asarray(random_axis_angles(rng, 16))
        f = jax.jit(jax.vmap(lambda v: log_so3(exp_so3(v))))
        np.testing.assert_allclose(np.asarray(f(y)), np.asarray(y), atol=1e-5)


class TestQuaternion:
    def test_unit_norm(self, rng):
        y = random_axis_angles(rng, 32)
        q = np.asarray(quat_from_axis_angle(jnp.asarray(y)))
        np.testing.assert_allclose(np.linalg.norm(q, axis=-1), 1.0, atol=1e-6)

    def test_rotation_roundtrip(self, rng):
        R = random_rotations(rng, 32)
        q = quat_from_rotation(jnp.asarray(R))
        y = axis_angle_from_quat(q)
        R2 = np.asarray(exp_so3(y))
        np.testing.assert_allclose(R2, R, atol=1e-5)

    def test_double_cover(self, rng):
        y = random_axis_angles(rng, 8)
        q = quat_from_axis_angle(jnp.asarray(y))
        theta = np.asarray(quat_geodesic_angle(q, -q))
        np.testing.assert_allclose(theta, 0.0, atol=1e-3)

    def test_identity_quaternion(self):
        q = np.asarray(quat_from_axis_angle(jnp.zeros((1, 3))))
        np.testing.assert_allclose(q, [[1.0, 0.0, 0.0, 0.0]], atol=1e-7)

    def test_angle_matches_so3(self, rng):
        y1 = random_axis_angles(rng, 16)
        y2 = random_axis_angles(rng, 16)
        t_q = np.asarray(
            quat_geodesic_angle(
                quat_from_axis_angle(jnp.asarray(y1)), quat_from_axis_angle(jnp.asarray(y2))
            )
        )
        t_R = np.asarray(geodesic_distance_aa(jnp.asarray(y1), jnp.asarray(y2)))
        np.testing.assert_allclose(t_q, t_R, atol=1e-4)


@pytest.mark.skipif(not HAS_REFERENCE, reason="reference repo not mounted")
class TestReferenceParity:
    """Golden parity against the reference's numpy implementations."""

    @classmethod
    def setup_class(cls):
        sys.path.insert(0, REFERENCE)
        import helperFunctions as hf  # noqa: F401
        import axisAngle as aa
        import quaternion as qt

        cls.hf, cls.aa, cls.qt = hf, aa, qt

    @classmethod
    def teardown_class(cls):
        sys.path.remove(REFERENCE)

    def test_rotation_from_euler_parity(self, rng):
        for _ in range(20):
            az, el, ct = rng.uniform(-180, 180, 3)
            ours = np.asarray(rotation_from_euler(jnp.float64(az), jnp.float64(el), jnp.float64(ct)))
            ref = self.hf.rotation_matrix(az, el, ct)
            np.testing.assert_allclose(ours, ref, atol=1e-5)

    def test_log_so3_parity(self, rng):
        R = random_rotations(rng, 50)
        ours = np.asarray(log_so3(jnp.asarray(R)))
        ref = np.stack([self.aa.get_y(R[i]) for i in range(50)])
        np.testing.assert_allclose(ours, ref, atol=1e-5)

    def test_exp_so3_parity(self, rng):
        y = random_axis_angles(rng, 50)
        ours = np.asarray(exp_so3(jnp.asarray(y)))
        ref = np.stack([self.aa.get_R(y[i]) for i in range(50)])
        np.testing.assert_allclose(ours, ref, atol=1e-5)

    def test_quat_parity(self, rng):
        R = random_rotations(rng, 50)
        ours = np.asarray(quat_from_rotation(jnp.asarray(R)))
        ref = np.stack([self.qt.get_y(R[i]) for i in range(50)])
        np.testing.assert_allclose(ours, ref, atol=1e-5)

    def test_convert_dictionary_parity(self, rng):
        d = random_axis_angles(rng, 20)
        ours = np.asarray(convert_dictionary(jnp.asarray(d)))
        ref = self.qt.convert_dictionary(d)
        np.testing.assert_allclose(ours, ref, atol=1e-5)
