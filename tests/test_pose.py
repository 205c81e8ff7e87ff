"""Pose-algebra invariant tests.

Direct counterparts of the reference's only pytest suite
(src/dataset/camera_pose/tests/test_camera_poses.py:6-35): inverse-of-inverse,
R^-1 R = I, R^-1 = R^T, t^-1 = -R^T t, all repeated after coordinate-system
conversion, plus conversion-matrix conjugation — expressed on the array-level
pose algebra.
"""

import jax.numpy as jnp
import numpy as np
from scipy.spatial.transform import Rotation

from tpu3drecon.geometry import pose as P
from tpu3drecon.geometry import rotations as rot


def random_pose(rng):
    rmat = jnp.array(Rotation.random(random_state=np.random.RandomState(rng.integers(2**31))).as_matrix())
    tvec = jnp.array(rng.normal(size=3))
    return rmat, tvec


class TestInverse:
    def test_inverse_of_inverse_is_identity(self, rng):
        rmat, tvec = random_pose(rng)
        r2, t2 = P.pose_inverse(*P.pose_inverse(rmat, tvec))
        np.testing.assert_allclose(np.array(r2), np.array(rmat), atol=1e-12)
        np.testing.assert_allclose(np.array(t2), np.array(tvec), atol=1e-12)

    def test_inverse_rotation_is_transpose(self, rng):
        rmat, tvec = random_pose(rng)
        rinv, tinv = P.pose_inverse(rmat, tvec)
        np.testing.assert_allclose(np.array(rinv), np.array(rmat).T, atol=1e-12)
        np.testing.assert_allclose(
            np.array(rinv @ rmat), np.eye(3), atol=1e-12
        )

    def test_inverse_translation(self, rng):
        rmat, tvec = random_pose(rng)
        _, tinv = P.pose_inverse(rmat, tvec)
        np.testing.assert_allclose(
            np.array(tinv), -np.array(rmat).T @ np.array(tvec), atol=1e-12
        )

    def test_compose_with_inverse_is_identity(self, rng):
        rmat, tvec = random_pose(rng)
        rinv, tinv = P.pose_inverse(rmat, tvec)
        rc, tc = P.pose_compose(rmat, tvec, rinv, tinv)
        np.testing.assert_allclose(np.array(rc), np.eye(3), atol=1e-12)
        np.testing.assert_allclose(np.array(tc), np.zeros(3), atol=1e-12)


class TestCoordinateSystemConversion:
    def test_involutive(self, rng):
        rmat, tvec = random_pose(rng)
        r2, t2 = P.pose_convert_coordinate_system(
            *P.pose_convert_coordinate_system(rmat, tvec)
        )
        np.testing.assert_allclose(np.array(r2), np.array(rmat), atol=1e-12)
        np.testing.assert_allclose(np.array(t2), np.array(tvec), atol=1e-12)

    def test_inverse_invariants_after_conversion(self, rng):
        # Reference test_camera_poses.py:20-29: the inverse invariants hold in
        # the converted frame too.
        rmat, tvec = random_pose(rng)
        rc, tc = P.pose_convert_coordinate_system(rmat, tvec)
        rinv, tinv = P.pose_inverse(rc, tc)
        np.testing.assert_allclose(np.array(rinv), np.array(rc).T, atol=1e-12)
        np.testing.assert_allclose(
            np.array(tinv), -np.array(rc).T @ np.array(tc), atol=1e-12
        )

    def test_conjugation_structure(self, rng):
        # Reference test_camera_poses.py:33-35: conversion is conjugation by
        # diag(1,-1,1).
        rmat, tvec = random_pose(rng)
        conv = np.diag([1.0, -1.0, 1.0])
        rc, tc = P.pose_convert_coordinate_system(rmat, tvec)
        np.testing.assert_allclose(np.array(rc), conv @ np.array(rmat) @ conv, atol=1e-12)
        np.testing.assert_allclose(np.array(tc), conv @ np.array(tvec), atol=1e-12)

    def test_still_a_rotation(self, rng):
        rmat, tvec = random_pose(rng)
        rc, _ = P.pose_convert_coordinate_system(rmat, tvec)
        rc = np.array(rc)
        np.testing.assert_allclose(rc @ rc.T, np.eye(3), atol=1e-12)
        np.testing.assert_allclose(np.linalg.det(rc), 1.0, atol=1e-12)


class TestCenterAndErrors:
    def test_camera_center(self, rng):
        rmat, tvec = random_pose(rng)
        c = P.camera_center(rmat, tvec)
        # Projecting the center through the pose gives the origin.
        np.testing.assert_allclose(
            np.array(P.pose_apply(rmat, tvec, c)), np.zeros(3), atol=1e-12
        )

    def test_geodesic_angle(self, rng):
        rvec = jnp.array([0.3, -0.2, 0.5])
        ra = rot.rodrigues_to_matrix(jnp.zeros(3))
        rb = rot.rodrigues_to_matrix(rvec)
        angle = float(P.rotation_geodesic_angle(ra, rb))
        np.testing.assert_allclose(angle, np.linalg.norm(np.array(rvec)), atol=1e-10)

    def test_geodesic_angle_identical(self, rng):
        rmat, _ = random_pose(rng)
        assert float(P.rotation_geodesic_angle(rmat, rmat)) < 1e-6

    def test_matrix_forms(self, rng):
        rmat, tvec = random_pose(rng)
        m34 = np.array(P.pose_to_matrix_3x4(rmat, tvec))
        m44 = np.array(P.pose_to_matrix_4x4(rmat, tvec))
        np.testing.assert_allclose(m44[:3], m34)
        np.testing.assert_allclose(m44[3], [0, 0, 0, 1])
