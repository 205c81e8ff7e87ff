"""Projection tests against an independent numpy oracle.

Oracle mirrors the reference's CPU residual check
(src/reconstruction/bundle_adjustment/utils.py:6-12) and Camera.project
(src/dataset/camera.py:57-64): uv = K [R|t] X, perspective divide.
"""

import jax.numpy as jnp
import numpy as np
from scipy.spatial.transform import Rotation

from tpu3drecon.geometry import projection as proj


def numpy_project(K, rmat, tvec, xyz):
    p = K @ (rmat @ xyz + tvec)
    return p[:2] / p[2]


def make_camera(rng):
    rmat = Rotation.random(random_state=np.random.RandomState(7)).as_matrix()
    tvec = rng.normal(size=3)
    fx_fy = np.array([1200.0, 1180.0])
    cx_cy_skew = np.array([640.0, 360.0, 0.1])
    K = np.array(
        [
            [fx_fy[0], cx_cy_skew[2], cx_cy_skew[0]],
            [0.0, fx_fy[1], cx_cy_skew[1]],
            [0.0, 0.0, 1.0],
        ]
    )
    return rmat, tvec, fx_fy, cx_cy_skew, K


def points_in_front(rng, rmat, tvec, n=100):
    # Sample camera-frame points with z > 0 and pull them back to world.
    xyz_cam = np.stack(
        [rng.normal(size=n), rng.normal(size=n), rng.uniform(2.0, 10.0, size=n)], axis=1
    )
    return (xyz_cam - tvec) @ rmat  # == R^T (xc - t)


class TestProjection:
    def test_matches_numpy_oracle(self, rng):
        rmat, tvec, fx_fy, cx_cy_skew, K = make_camera(rng)
        pts = points_in_front(rng, rmat, tvec)
        ours = np.array(
            proj.project_points(
                jnp.array(rmat), jnp.array(tvec), jnp.array(fx_fy), jnp.array(cx_cy_skew), jnp.zeros(2), jnp.array(pts)
            )
        )
        ref = np.stack([numpy_project(K, rmat, tvec, p) for p in pts])
        np.testing.assert_allclose(ours, ref, atol=1e-9)

    def test_intrinsics_matrix_assembly(self):
        K = np.array(
            proj.make_intrinsics_matrix(
                jnp.array([1200.0, 1180.0]), jnp.array([640.0, 360.0, 0.1])
            )
        )
        expected = np.array([[1200.0, 0.1, 640.0], [0.0, 1180.0, 360.0], [0.0, 0.0, 1.0]])
        np.testing.assert_allclose(K, expected)

    def test_masked_residuals_zero_on_padding(self, rng):
        rmat, tvec, fx_fy, cx_cy_skew, K = make_camera(rng)
        pts = points_in_front(rng, rmat, tvec, n=10)
        obs = np.stack([numpy_project(K, rmat, tvec, p) for p in pts])
        obs += rng.normal(size=obs.shape)
        mask = np.ones(10)
        mask[7:] = 0.0
        res = np.array(
            proj.reprojection_residuals(
                jnp.array(rmat),
                jnp.array(tvec),
                jnp.array(fx_fy),
                jnp.array(cx_cy_skew),
                jnp.zeros(2),
                jnp.array(pts),
                jnp.array(obs),
                jnp.array(mask),
            )
        )
        assert np.all(res[7:] == 0.0)
        assert np.all(res[:7] != 0.0)

    def test_perfect_observation_zero_residual(self, rng):
        rmat, tvec, fx_fy, cx_cy_skew, K = make_camera(rng)
        pts = points_in_front(rng, rmat, tvec, n=10)
        obs = np.stack([numpy_project(K, rmat, tvec, p) for p in pts])
        res = np.array(
            proj.reprojection_residuals(
                jnp.array(rmat),
                jnp.array(tvec),
                jnp.array(fx_fy),
                jnp.array(cx_cy_skew),
                jnp.zeros(2),
                jnp.array(pts),
                jnp.array(obs),
                jnp.ones(10),
            )
        )
        np.testing.assert_allclose(res, 0.0, atol=1e-9)

    def test_batched_projection_shape(self, rng):
        B, N = 4, 16
        rmats = np.stack([Rotation.random(random_state=np.random.RandomState(i)).as_matrix() for i in range(B)])
        tvecs = rng.normal(size=(B, 3))
        fx_fy = np.full((B, 2), 1000.0)
        ccs = np.zeros((B, 3))
        pts = rng.normal(size=(B, N, 3)) + np.array([0, 0, 5.0])
        out = proj.project_points_batched(
            jnp.array(rmats), jnp.array(tvecs), jnp.array(fx_fy), jnp.array(ccs), jnp.zeros((B, 2)), jnp.array(pts)
        )
        assert out.shape == (B, N, 2)


    def test_radial_distortion_matches_oracle(self, rng):
        rmat, tvec, fx_fy, cx_cy_skew, K = make_camera(rng)
        pts = points_in_front(rng, rmat, tvec, n=50)
        dist = np.array([-0.15, 0.03])
        ours = np.array(
            proj.project_points(
                jnp.array(rmat), jnp.array(tvec), jnp.array(fx_fy),
                jnp.array(cx_cy_skew), jnp.array(dist), jnp.array(pts)
            )
        )
        # Independent numpy oracle with the same polynomial model.
        xc = pts @ rmat.T + tvec
        m = xc[:, :2] / xc[:, 2:3]
        r2 = np.sum(m * m, axis=1, keepdims=True)
        md = (1.0 + dist[0] * r2 + dist[1] * r2 * r2) * m
        ref = np.stack(
            [
                fx_fy[0] * md[:, 0] + cx_cy_skew[2] * md[:, 1] + cx_cy_skew[0],
                fx_fy[1] * md[:, 1] + cx_cy_skew[1],
            ],
            axis=1,
        )
        np.testing.assert_allclose(ours, ref, atol=1e-9)
        # And dist = 0 reduces exactly to the pinhole projection.
        pin = np.array(
            proj.project_points(
                jnp.array(rmat), jnp.array(tvec), jnp.array(fx_fy),
                jnp.array(cx_cy_skew), jnp.zeros(2), jnp.array(pts)
            )
        )
        pin_ref = np.stack([numpy_project(K, rmat, tvec, p) for p in pts])
        np.testing.assert_allclose(pin, pin_ref, atol=1e-9)
