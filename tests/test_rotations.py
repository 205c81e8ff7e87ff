"""Rotation algebra tests: round-trips, scipy parity, singularity safety.

Extends the invariant-test style of the reference suite
(src/dataset/camera_pose/tests/test_camera_poses.py) with the coverage it
lacked: theta->0 / theta->pi edge cases and gradient finiteness.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest
from scipy.spatial.transform import Rotation

from tpu3drecon.geometry import rotations as rot


def random_rotvecs(rng, n=64):
    v = rng.normal(size=(n, 3))
    scales = rng.uniform(0.01, np.pi - 0.01, size=(n, 1))
    return v / np.linalg.norm(v, axis=1, keepdims=True) * scales


class TestRodriguesMatrix:
    def test_matches_scipy(self, rng):
        rvecs = random_rotvecs(rng)
        ours = np.array(rot.rodrigues_to_matrix_batch(jnp.array(rvecs)))
        ref = Rotation.from_rotvec(rvecs).as_matrix()
        np.testing.assert_allclose(ours, ref, atol=1e-12)

    def test_round_trip(self, rng):
        rvecs = random_rotvecs(rng)
        back = np.array(
            rot.matrix_to_rodrigues_batch(rot.rodrigues_to_matrix_batch(jnp.array(rvecs)))
        )
        np.testing.assert_allclose(back, rvecs, atol=1e-9)

    def test_zero_rotation_is_identity_not_nan(self):
        r = rot.rodrigues_to_matrix(jnp.zeros(3))
        np.testing.assert_allclose(np.array(r), np.eye(3), atol=1e-12)

    def test_tiny_rotation_finite(self):
        r = rot.rodrigues_to_matrix(jnp.array([1e-10, 0.0, 0.0]))
        assert np.all(np.isfinite(np.array(r)))

    def test_near_pi_round_trip(self, rng):
        axes = rng.normal(size=(16, 3))
        axes /= np.linalg.norm(axes, axis=1, keepdims=True)
        rvecs = axes * (np.pi - 1e-7)
        mats = rot.rodrigues_to_matrix_batch(jnp.array(rvecs))
        back = np.array(rot.matrix_to_rodrigues_batch(mats))
        # Axis may flip sign at exactly pi; compare rotations, not vectors.
        ref = Rotation.from_rotvec(rvecs)
        got = Rotation.from_rotvec(back)
        diff = (ref.inv() * got).magnitude()
        np.testing.assert_allclose(diff, 0.0, atol=1e-6)

    def test_gradient_finite_at_zero(self):
        g = jax.jacobian(rot.rodrigues_to_matrix)(jnp.zeros(3))
        assert np.all(np.isfinite(np.array(g)))

    def test_orthonormality(self, rng):
        rvecs = random_rotvecs(rng)
        mats = np.array(rot.rodrigues_to_matrix_batch(jnp.array(rvecs)))
        eye = np.broadcast_to(np.eye(3), mats.shape)
        np.testing.assert_allclose(mats @ mats.transpose(0, 2, 1), eye, atol=1e-12)
        np.testing.assert_allclose(np.linalg.det(mats), 1.0, atol=1e-12)


class TestQuaternions:
    def test_matrix_quat_round_trip(self, rng):
        rvecs = random_rotvecs(rng)
        mats = Rotation.from_rotvec(rvecs).as_matrix()
        quats = rot.matrix_to_quat_batch(jnp.array(mats))
        back = np.array(rot.quat_to_matrix_batch(quats))
        np.testing.assert_allclose(back, mats, atol=1e-10)

    def test_matches_scipy_quat(self, rng):
        rvecs = random_rotvecs(rng)
        mats = Rotation.from_rotvec(rvecs).as_matrix()
        ours = np.array(rot.matrix_to_quat_batch(jnp.array(mats)))
        ref = rot.xyzw_to_wxyz(jnp.array(Rotation.from_matrix(mats).as_quat()))
        ref = np.array(ref)
        # Sign convention: w >= 0.
        ref *= np.where(ref[:, :1] < 0, -1.0, 1.0)
        np.testing.assert_allclose(ours, ref, atol=1e-10)

    def test_quat_mul_matches_matrix_product(self, rng):
        a, b = random_rotvecs(rng, 2)
        qa, qb = rot.rodrigues_to_quat(jnp.array(a)), rot.rodrigues_to_quat(jnp.array(b))
        lhs = np.array(rot.quat_to_matrix(rot.quat_mul(qa, qb)))
        rhs = np.array(rot.quat_to_matrix(qa) @ rot.quat_to_matrix(qb))
        np.testing.assert_allclose(lhs, rhs, atol=1e-12)

    def test_quat_rotate_matches_matrix(self, rng):
        rvec = jnp.array(random_rotvecs(rng, 1)[0])
        v = jnp.array(rng.normal(size=3))
        q = rot.rodrigues_to_quat(rvec)
        np.testing.assert_allclose(
            np.array(rot.quat_rotate(q, v)),
            np.array(rot.rodrigues_to_matrix(rvec) @ v),
            atol=1e-12,
        )

    def test_identity_quat(self):
        q = rot.rodrigues_to_quat(jnp.zeros(3))
        np.testing.assert_allclose(np.array(q), [1.0, 0, 0, 0], atol=1e-12)
        rv = rot.quat_to_rodrigues(jnp.array([1.0, 0, 0, 0]))
        np.testing.assert_allclose(np.array(rv), np.zeros(3), atol=1e-12)


class TestSkew:
    def test_cross_product(self, rng):
        v = jnp.array(rng.normal(size=3))
        w = jnp.array(rng.normal(size=3))
        np.testing.assert_allclose(
            np.array(rot.skew(v) @ w), np.array(jnp.cross(v, w)), atol=1e-12
        )


@pytest.mark.parametrize("dtype", [jnp.float32, jnp.float64])
def test_dtype_preserved(dtype, rng):
    rvec = jnp.array(random_rotvecs(rng, 1)[0], dtype=dtype)
    assert rot.rodrigues_to_matrix(rvec).dtype == dtype
    assert rot.rodrigues_to_quat(rvec).dtype == dtype
