"""Compat-surface tests: reference API contracts work end-to-end."""

import jax.numpy as jnp
import numpy as np
import pytest

from tpu3drecon import compat
from tpu3drecon.dataset.synthetic import make_scene, perturb_scene


@pytest.fixture(scope="module")
def scene():
    return make_scene(n_cameras=4, n_points=120, seed=51)


@pytest.fixture(scope="module")
def noisy(scene):
    return perturb_scene(
        scene, point3d_noise=2e-2, camera_rotation_noise=1e-2,
        camera_translation_noise=3e-2, camera_intrinsics_noise=5.0,
        point2d_noise=0.0, seed=52,
    )


class TestUtilsCompat:
    def test_rot_mat_from_vec(self):
        r = np.asarray(compat.rot_mat_from_vec([0.1, -0.2, 0.3]))
        from scipy.spatial.transform import Rotation

        np.testing.assert_allclose(
            r, Rotation.from_rotvec([0.1, -0.2, 0.3]).as_matrix(), atol=1e-9
        )

    def test_rot_mat_from_vec_zero_safe(self):
        # The reference's version NaN'd at exactly zero (utils.py:22-23).
        r = np.asarray(compat.rot_mat_from_vec([0.0, 0.0, 0.0]))
        np.testing.assert_allclose(r, np.eye(3), atol=1e-12)

    def test_pose_round_trip(self):
        from scipy.spatial.transform import Rotation

        rot = Rotation.from_rotvec([0.2, 0.1, -0.4]).as_matrix()
        pose = np.c_[rot, [1.0, 2.0, 3.0]]
        vec = np.asarray(compat.pose_mat_to_vec(pose))
        back = np.asarray(compat.parse_cam_pose(vec))
        np.testing.assert_allclose(back, pose, atol=1e-7)

    def test_parse_intrinsics(self):
        k = np.asarray(compat.parse_intrinsics([1000.0, 990.0], [320.0, 240.0, 0.5]))
        np.testing.assert_allclose(
            k, [[1000.0, 0.5, 320.0], [0.0, 990.0, 240.0], [0.0, 0.0, 1.0]]
        )


class TestJaxPoseOptimizerCompat:
    def test_end_to_end(self, scene, noisy):
        B = scene.n_cameras
        opt = compat.JaxPoseOptimizer(avg_cam_width=scene.width)
        poses0 = np.concatenate([noisy.rmats, noisy.tvecs[:, :, None]], axis=2)
        intr0 = np.concatenate([noisy.fx_fy, scene.cx_cy_skew], axis=1)
        opt_params, cx_cy_skew = opt.prepare_params(poses0, intr0)
        assert opt_params.shape == (B, 8)

        # Pack per-camera fixed points + clean observations.
        counts = np.bincount(scene.cam_idx, minlength=B)
        n_max = int(counts.max())
        pts = np.zeros((B, n_max, 3))
        obs = np.zeros((B, n_max, 2))
        mask = np.zeros((B, n_max))
        for c in range(B):
            sel = scene.cam_idx == c
            k = int(sel.sum())
            pts[c, :k] = scene.points3d[scene.pt_idx[sel]]
            obs[c, :k] = scene.uv[sel]
            mask[c, :k] = 1.0

        params, state = opt.optimize(opt_params, pts, obs, cx_cy_skew, mask)
        assert params.shape == (B, 8)
        assert np.all(np.isfinite(np.asarray(params)))
        # Recovered focals should approach GT (points were held at GT).
        np.testing.assert_allclose(
            np.asarray(params[:, 6:8]), scene.fx_fy, rtol=5e-2
        )


class TestJaxBundleAdjustmentCompat:
    def test_end_to_end(self, scene, noisy):
        B = scene.n_cameras
        ba = compat.JaxBundleAdjustment(cam_num=B, avg_cam_width=scene.width)
        poses0 = np.concatenate([noisy.rmats, noisy.tvecs[:, :, None]], axis=2)
        intr0 = np.concatenate([noisy.fx_fy, scene.cx_cy_skew], axis=1)
        opt_params, cx_cy_skew = ba.prepare_params(poses0, intr0, noisy.points3d)
        assert opt_params.shape == (B * 8 + scene.n_points * 3,)

        counts = np.bincount(scene.cam_idx, minlength=B)
        n_max = int(counts.max())
        p2d = np.zeros((B, n_max, 2))
        pidx = np.zeros((B, n_max), dtype=np.int32)
        mask = np.zeros((B, n_max))
        for c in range(B):
            sel = scene.cam_idx == c
            k = int(sel.sum())
            p2d[c, :k] = scene.uv[sel]
            pidx[c, :k] = scene.pt_idx[sel]
            mask[c, :k] = 1.0

        out, state = ba.optimize(opt_params, p2d, pidx, cx_cy_skew, mask)
        assert out.shape == opt_params.shape
        # Final mean whitened loss tiny (noiseless observations).
        assert float(state.loss) < 1e-6


class TestDatasetSurface:
    def test_reference_names_importable(self):
        for name in (
            "Dataset", "DatasetEntry", "Camera", "CameraIntrinsics", "Point2D",
            "Point3D", "ImageMetadata", "CameraPose", "CameraSet",
            "load_colmap_dataset", "export_in_colmap_format", "LossFunction",
            "JaxLossFunction", "to_gpu",
        ):
            assert hasattr(compat, name), name
